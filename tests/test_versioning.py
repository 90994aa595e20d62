
import pytest

from rtts.data.versioning import pull, push, snapshot, status


def _mk(tmp_path, name, content):
    p = tmp_path / name
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content)
    return p


def test_snapshot_status_push_pull(tmp_path):
    a = _mk(tmp_path, "data/a.txt", "alpha")
    b = _mk(tmp_path, "data/sub/b.txt", "beta")
    lock = tmp_path / "data.lock.json"
    entries = snapshot([str(tmp_path / "data")], str(lock))
    assert len(entries) == 2

    st = status(str(lock))
    assert len(st["clean"]) == 2 and not st["changed"] and not st["missing"]

    remote = tmp_path / "remote"
    assert push(str(lock), str(remote)) == 2
    # re-push is a no-op (content addressed)
    assert push(str(lock), str(remote)) == 0

    # mutate + delete, then pull restores
    a.write_text("ALPHA CHANGED")
    b.unlink()
    st = status(str(lock))
    assert str(a) in st["changed"] and str(b) in st["missing"]
    restored, missing = pull(str(lock), str(remote))
    assert restored == 2 and not missing
    assert a.read_text() == "alpha" and b.read_text() == "beta"


def test_url_remote_raises_actionable(tmp_path):
    _mk(tmp_path, "d.txt", "x")
    lock = tmp_path / "lock.json"
    snapshot([str(tmp_path / "d.txt")], str(lock))
    with pytest.raises(RuntimeError, match="egress"):
        push(str(lock), "gs://bucket/prefix")


def test_unknown_scheme_raises_actionable(tmp_path):
    _mk(tmp_path, "d.txt", "x")
    lock = tmp_path / "lock.json"
    snapshot([str(tmp_path / "d.txt")], str(lock))
    with pytest.raises(RuntimeError, match="register_transport"):
        push(str(lock), "s3://bucket/prefix")


class _FakeCloudTransport:
    """In-memory blob store exercising the seam a real cloud remote uses."""

    stores: dict = {}

    def __init__(self, remote):
        self.blobs = self.stores.setdefault(remote, {})

    def exists(self, key):
        return key in self.blobs

    def upload(self, local, key):
        self.blobs[key] = open(local, "rb").read()

    def download(self, key, local):
        if key not in self.blobs:
            return False
        with open(local, "wb") as f:
            f.write(self.blobs[key])
        return True


def test_push_pull_through_registered_transport(tmp_path):
    from rtts.data.versioning import register_transport

    register_transport("fake", _FakeCloudTransport)
    a = _mk(tmp_path, "data/a.txt", "alpha")
    b = _mk(tmp_path, "data/b.txt", "beta")
    lock = tmp_path / "lock.json"
    snapshot([str(tmp_path / "data")], str(lock))

    remote = "fake://bucket/corpus"
    assert push(str(lock), remote) == 2
    assert push(str(lock), remote) == 0      # content-addressed no-op
    a.write_text("MUTATED")
    b.unlink()
    restored, missing = pull(str(lock), remote)
    assert restored == 2 and not missing
    assert a.read_text() == "alpha" and b.read_text() == "beta"

    # a blob the remote lost is reported, not crashed on
    _FakeCloudTransport.stores[remote].clear()
    b.unlink()
    restored, missing = pull(str(lock), remote)
    assert restored == 0 and missing == [str(b)]
