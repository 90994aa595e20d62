"""Offline golden-page tests for the scrape/parse pipeline (VERDICT r3
item 4 — SURVEY.md §3.1 #3-4, §4.4).

The fixtures under tests/fixtures/scrape/ are authored to mirror the
reference's rev.com-style transcript-library pages: full page chrome
(nav/script/style/footer), mixed attribute quoting and case, HTML
entities, relative links, duplicate links, decoy links inside
script/style, speaker-labeled paragraphs with inline (hh:mm:ss)
timestamps, and data-start/data-end timed paragraphs with an embedded
media element.  No network is touched anywhere here.
"""

import pathlib

import numpy as np
import pytest

from rtts.data.download import (
    TranscriptEntry,
    parse_media_url,
    parse_transcript_index,
    parse_transcript_page,
    write_transcripts,
)

FIX = pathlib.Path(__file__).parent / "fixtures" / "scrape"


def _page(name: str) -> bytes:
    return (FIX / name).read_bytes()


BASE = "https://transcripts.example.com/blog/transcripts?page=1"


def test_index_links_golden():
    links = parse_transcript_index(_page("index_page.html"), base_url=BASE)
    assert links == [
        "https://transcripts.example.com/blog/transcripts/"
        "press-briefing-march-12-transcript",
        "https://transcripts.example.com/blog/transcripts/"
        "town-hall-q&a-transcript",
        "https://transcripts.example.com/transcripts/"
        "keynote-2020-transcript?utm_source=feed",
    ]
    # without a base_url the raw hrefs come back (entity-unescaped, deduped)
    raw = parse_transcript_index(_page("index_page.html"))
    assert raw[0] == "/blog/transcripts/press-briefing-march-12-transcript"
    assert len(raw) == 3


def test_index_links_second_layout():
    links = parse_transcript_index(_page("index_page2.html"),
                                   base_url="https://example.org/page/2/")
    assert "https://example.org/2020/04/02/briefing-april-2-transcript/" \
        in links
    assert ("https://example.org/2020/04/03/interview-dr-smith-TRANSCRIPT/"
            in links)
    assert all("photo-gallery" not in ln for ln in links)


def test_timed_transcript_page_golden():
    page = _page("transcript_timed.html")
    url = ("https://transcripts.example.com/blog/transcripts/"
           "press-briefing-march-12-transcript")
    assert parse_media_url(page, base_url=url) == \
        "https://transcripts.example.com/media/press-briefing-march-12.mp4"
    entries = parse_transcript_page(page, "doc000_", base_url=url)
    # nav/footer/script/style paragraphs and the &nbsp; caption are gone
    assert [e.text for e in entries] == [
        "Good afternoon, everyone & welcome to today’s briefing.",
        "We’ll begin with a short statement, followed by questions "
        "— please wait for the microphone.",
        "The numbers released this morning show a 4.5% increase over last "
        "year’s figures.",
        "Transcription provided by the communications office.",
    ]
    assert entries[0].speaker == "Moderator"
    np.testing.assert_allclose(
        [(e.start_s, e.end_s) for e in entries[:3]],
        [(0.0, 4.8), (4.8, 12.25), (12.25, 19.0)])
    assert entries[3].start_s is None
    assert entries[0].utt_id == "doc000_0000"
    assert all(e.media_url.endswith("press-briefing-march-12.mp4")
               for e in entries)


def test_speaker_transcript_page_golden():
    page = _page("transcript_speaker.html")
    url = "https://transcripts.example.com/blog/transcripts/town-hall"
    media = parse_media_url(page, base_url=url)
    assert media == "https://cdn.example.com/town-hall.m4a?token=xyz"
    entries = parse_transcript_page(page, "doc001_", base_url=url)
    timed = [e for e in entries if e.start_s is not None]
    assert [e.speaker for e in timed] == [
        "Speaker 1", "Speaker 2", "Speaker 1", "Mayor Jane Q. Public"]
    # inline (mm:ss) stamps become starts; ends fill from the next start
    assert [(e.start_s, e.end_s) for e in timed] == [
        (3.0, 11.0), (11.0, 95.0), (95.0, 3729.0), (3729.0, None)]
    # the mid-paragraph jump-link stamp (00:40) is stripped from the text
    assert "(00:40)" not in timed[2].text
    assert timed[2].text.startswith("That’s a fair question.")
    # the final speaker paragraph keeps its inner clause colon
    assert timed[3].text == "Closing remarks: thank you, and good night."


def test_write_transcripts_layouts(tmp_path):
    """Timed entries with media produce the utt|source|start|end|text layout
    preprocess_corpus cuts from; untimed ones the plain utt|text layout —
    and parse_transcript_line round-trips both."""
    from rtts.data.preprocess import parse_transcript_line

    entries = [
        TranscriptEntry("u0", "hello there", "https://c/x.mp4?s=1", 1.0, 2.5),
        TranscriptEntry("u1", "no timing | with pipe"),
        TranscriptEntry("u2", "start but no end", "https://c/x.mp4", 5.0),
    ]
    path = tmp_path / "transcripts.txt"
    write_transcripts(entries, path)
    lines = path.read_text().splitlines()
    assert lines[0] == "u0|media/x.mp4|1.0|2.5|hello there"
    assert lines[1] == "u1|no timing | with pipe"
    assert lines[2] == "u2|start but no end"
    utt, src, s, e, text = parse_transcript_line(lines[0])
    assert (utt, src, s, e, text) == ("u0", "media/x.mp4", 1.0, 2.5,
                                      "hello there")
    utt, src, s, e, text = parse_transcript_line(lines[1])
    assert (utt, s, text) == ("u1", None, "no timing | with pipe")


def test_scraped_timings_cut_real_audio(tmp_path):
    """End-to-end offline ingestion: golden-page timings -> transcripts.txt
    -> preprocess cuts the utterances out of a long recording (SURVEY.md
    §4.4 alignment stage) into mel clips + manifest."""
    import json

    from rtts.config import AudioConfig, DatasetConfig, TextConfig
    from rtts.audio.wav import write_wav
    from rtts.data.preprocess import preprocess_corpus

    sr = 22050
    # a 25 s "recording" with distinct tones so cuts are verifiable
    t = np.arange(25 * sr) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    (tmp_path / "media").mkdir()
    write_wav(tmp_path / "media" / "press-briefing-march-12.mp4.wav",
              audio, sr)

    entries = parse_transcript_page(_page("transcript_timed.html"), "d0_")
    timed = [e for e in entries if e.start_s is not None][:3]
    # point at the local extracted audio (the ffmpeg step's output name)
    for e in timed:
        e.media_url = "local/press-briefing-march-12.mp4.wav"
    write_transcripts(timed, tmp_path / "transcripts.txt")

    cfg = DatasetConfig(data_dir=str(tmp_path / "data"), audio=AudioConfig(),
                        text=TextConfig())
    manifest = preprocess_corpus(cfg, str(tmp_path / "transcripts.txt"))
    items = json.loads(pathlib.Path(manifest).read_text())["clips"]
    assert len(items) == 3
    hop = cfg.audio.hop_length
    for item, e in zip(items, timed):
        want_frames = int((e.end_s - e.start_s) * sr) // hop
        # trim_silence on a pure tone trims nothing; cut length matches
        assert abs(item["n_frames"] - want_frames) <= 2


def test_bring_your_own_wavs_ingestion(tmp_path):
    """The documented no-scraper path (fetch_url's error message): put
    wavs/*.wav + transcripts.txt with `id|text` lines under a dir and
    preprocess ingests them."""
    import json

    from rtts.config import AudioConfig, DatasetConfig, TextConfig
    from rtts.audio.wav import write_wav
    from rtts.data.preprocess import preprocess_corpus

    sr = 22050
    (tmp_path / "wavs").mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        wav = (0.3 * rng.randn(sr)).astype(np.float32)
        write_wav(tmp_path / "wavs" / f"utt{i}.wav", wav, sr)
    (tmp_path / "transcripts.txt").write_text(
        "utt0|Hello from my own corpus.\nutt1|Second utterance, no scraping.\n")
    cfg = DatasetConfig(data_dir=str(tmp_path / "data"), audio=AudioConfig(),
                        text=TextConfig())
    manifest = preprocess_corpus(cfg, str(tmp_path / "transcripts.txt"))
    items = json.loads(pathlib.Path(manifest).read_text())["clips"]
    assert [it["utt_id"] for it in items] == ["utt0", "utt1"]
    assert all(it["n_frames"] > 0 for it in items)
