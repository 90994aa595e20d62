"""Dataset download/scrape stage (SURVEY.md §3.1 #3).

Capability parity with the reference's transcript+video scraper: an index
fetch, per-item transcript parse, and media download, driven from the CLI.
This environment has zero network egress, so every fetch path raises a
clear, actionable error and the pipeline documents the synthetic-corpus
alternative (``rtts.data.corpus.generate_corpus``) used for all in-repo
training and tests.
"""

from __future__ import annotations

import json
import pathlib
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import List, Optional


@dataclass
class TranscriptEntry:
    utt_id: str
    text: str
    media_url: Optional[str] = None
    # transcript timing within the media (seconds), when the page carries it
    start_s: Optional[float] = None
    end_s: Optional[float] = None


def fetch_url(url: str, timeout: float = 20.0) -> bytes:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.read()
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            f"network fetch failed for {url!r} — this environment has no "
            "egress. Use `rtts.data.corpus.generate_corpus` to build the "
            "synthetic corpus, or place wav+transcript files under the data "
            "dir manually (wavs/*.wav + transcripts.txt with `id|text` lines)."
        ) from e


def parse_transcript_index(html: bytes) -> List[str]:
    """Extract transcript page links from an index page (href scraping)."""
    import re

    text = html.decode("utf-8", errors="ignore")
    return re.findall(r'href="([^"]+transcript[^"]*)"', text)


def parse_media_url(html: bytes) -> Optional[str]:
    """Extract the page's media (video/audio) URL: <video>/<source>/<a>
    links to common media extensions."""
    import re

    text = html.decode("utf-8", errors="ignore")
    m = re.search(r'<(?:video|source|audio)[^>]+src="([^"]+)"', text)
    if m:
        return m.group(1)
    m = re.search(r'href="([^"]+\.(?:mp4|webm|mkv|m4a|mp3|wav))"', text)
    return m.group(1) if m else None


def parse_transcript_page(html: bytes, utt_prefix: str) -> List[TranscriptEntry]:
    """Extract utterance texts (and timings, when the page carries
    data-start/data-end attributes) from a transcript page."""
    import re

    text = html.decode("utf-8", errors="ignore")
    text = re.sub(r"<script.*?</script>", "", text, flags=re.S)
    media = parse_media_url(html)
    out = []
    for i, m in enumerate(re.finditer(r"<p([^>]*)>(.*?)</p>", text,
                                      flags=re.S)):
        attrs, p = m.group(1), m.group(2)
        clean = re.sub(r"<[^>]+>", "", p).strip()
        if not clean:
            continue
        ts = re.search(r'data-start="([\d.]+)"', attrs)
        te = re.search(r'data-end="([\d.]+)"', attrs)
        out.append(TranscriptEntry(
            f"{utt_prefix}{i:04d}", clean, media_url=media,
            start_s=float(ts.group(1)) if ts else None,
            end_s=float(te.group(1)) if te else None))
    return out


def download_media(entries: List[TranscriptEntry], out_dir: str) -> List[str]:
    """Fetch each distinct media URL to <out_dir>/media/ (offline: raises
    the actionable fetch_url error).  Returns the local file paths."""
    out = pathlib.Path(out_dir) / "media"
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    seen = {}
    for e in entries:
        if not e.media_url or e.media_url in seen:
            continue
        name = pathlib.PurePosixPath(e.media_url.split("?")[0]).name
        path = out / (name or f"media{len(seen):03d}")
        path.write_bytes(fetch_url(e.media_url))
        seen[e.media_url] = str(path)
        paths.append(str(path))
    return paths


def download_corpus(index_url: str, out_dir: str,
                    fetch_media: bool = True) -> str:
    """Scrape transcript index -> fetch pages (+ media files) -> write
    transcripts.txt.  Pages carrying per-paragraph timings produce timed
    ``utt|source|start|end|text`` lines that preprocess cuts directly from
    the extracted audio (SURVEY.md §4.4); untimed pages produce plain
    ``utt|text`` lines.  (Raises a helpful error offline; see fetch_url.)"""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    index = fetch_url(index_url)
    links = parse_transcript_index(index)
    entries: List[TranscriptEntry] = []
    for j, link in enumerate(links):
        page = fetch_url(link)
        entries.extend(parse_transcript_page(page, f"doc{j:03d}_"))
    media_paths = download_media(entries, out_dir) if fetch_media else []
    with open(out / "transcripts.txt", "w") as f:
        for e in entries:
            if e.start_s is not None and e.end_s is not None and e.media_url:
                src = pathlib.PurePosixPath(e.media_url.split("?")[0]).name
                f.write(f"{e.utt_id}|media/{src}|{e.start_s}|{e.end_s}|"
                        f"{e.text}\n")
            else:
                f.write(f"{e.utt_id}|{e.text}\n")
    with open(out / "download_meta.json", "w") as f:
        json.dump({"index_url": index_url, "n_entries": len(entries),
                   "media_files": media_paths}, f)
    return str(out / "transcripts.txt")
