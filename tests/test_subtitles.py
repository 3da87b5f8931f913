"""SRT / WebVTT sidecar caption parsing."""

import pytest

from extractors_geo_spark import subtitles as S


def test_srt_roundtrip_and_multiline():
    cues = [(0, 1500, "hello world"), (2000, 3750, "two lines merged"),
            (3_600_000 + 61_000, 3_600_000 + 62_500, "hour mark")]
    doc = S.write_srt(cues)
    assert S.sniff(doc) == "srt"
    assert S.parse_cues(doc) == cues
    multi = "1\n00:00:00,000 --> 00:00:01,000\nline one\nline two\n\n"
    assert S.parse_cues(multi) == [(0, 1000, "line one line two")]


def test_webvtt_roundtrip_and_bom():
    cues = [(500, 900, "vtt cue"), (10_000, 12_000, "later")]
    doc = S.write_webvtt(cues)
    assert S.sniff(doc) == "vtt"
    assert S.parse_cues(doc) == cues
    assert S.parse_cues("﻿" + doc) == cues  # BOM tolerated


def test_rejects_prose():
    with pytest.raises(ValueError):
        S.parse_cues("no cues in this text at all")
    assert S.sniff("plain text") is None


def test_sidecar_operator(spark):
    from extractors_geo_spark.operators import multimodal as M

    rows = [
        ("a", S.write_srt([(0, 1000, "first")])),
        ("b", S.write_webvtt([(100, 200, "second")])),
        ("c", "not captions"),
    ]
    df = spark.createDataFrame(rows, "video_id string, text string")
    got = sorted((r["video_id"], r["start_ms"], r["caption"])
                 for r in M.sidecar_captions(df).collect())
    assert got == [("a", 0, "first"), ("b", 100, "second")]
