from rtts.nn.layers import (
    dense_init,
    dense,
    layer_norm_init,
    layer_norm,
    embedding_init,
    embedding,
    dropout,
    prenet_mlp_init,
    prenet_mlp,
)
from rtts.nn.conv import conv1d_init, conv1d, conv1d_params_shape
from rtts.nn.posenc import (
    sinusoidal_table,
    scaled_posenc_init,
    scaled_posenc,
    axial_posenc_init,
    axial_posenc,
)

__all__ = [
    "dense_init",
    "dense",
    "layer_norm_init",
    "layer_norm",
    "embedding_init",
    "embedding",
    "dropout",
    "prenet_mlp_init",
    "prenet_mlp",
    "conv1d_init",
    "conv1d",
    "conv1d_params_shape",
    "sinusoidal_table",
    "scaled_posenc_init",
    "scaled_posenc",
    "axial_posenc_init",
    "axial_posenc",
]
