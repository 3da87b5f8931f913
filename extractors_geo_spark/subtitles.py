"""Sidecar caption parsers: SubRip (.srt) and WebVTT (.vtt) — the two
formats crawl video captions actually arrive in. Pure text parsing with
errors-as-rejects; cue payloads keep inner newlines as single spaces.
"""

from __future__ import annotations

import re

_TS = re.compile(r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{1,3})")
_ARROW = re.compile(
    r"(\d{1,2}:\d{2}:\d{2}[,.]\d{1,3})\s*-->\s*(\d{1,2}:\d{2}:\d{2}[,.]\d{1,3})"
)


def _ms(ts: str) -> int:
    m = _TS.fullmatch(ts.strip())
    if not m:
        raise ValueError(f"bad timestamp {ts!r}")
    h, mi, s, frac = m.groups()
    return ((int(h) * 60 + int(mi)) * 60 + int(s)) * 1000 + int(frac.ljust(3, "0"))


def sniff(text: str) -> str | None:
    t = text.lstrip("﻿ \n\r\t")
    if t.startswith("WEBVTT"):
        return "vtt"
    if _ARROW.search(t[:4000]):
        return "srt"
    return None


def parse_cues(text: str) -> list[tuple[int, int, str]]:
    """SRT or WebVTT -> [(start_ms, end_ms, caption)], cue order kept.
    Raises ValueError for text that is neither format."""
    fmt = sniff(text)
    if fmt is None:
        raise ValueError("not SRT or WebVTT")
    out: list[tuple[int, int, str]] = []
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    i = 0
    while i < len(lines):
        m = _ARROW.search(lines[i])
        if not m:
            i += 1
            continue
        start, end = _ms(m.group(1)), _ms(m.group(2))
        i += 1
        payload: list[str] = []
        while i < len(lines) and lines[i].strip():
            payload.append(lines[i].strip())
            i += 1
        if payload:
            out.append((start, end, " ".join(payload)))
    return out


def write_srt(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text)] -> SubRip document (fixture writer)."""
    def fmt(ms: int) -> str:
        h, rem = divmod(ms, 3600_000)
        mi, rem = divmod(rem, 60_000)
        s, frac = divmod(rem, 1000)
        return f"{h:02d}:{mi:02d}:{s:02d},{frac:03d}"

    blocks = [f"{i + 1}\n{fmt(a)} --> {fmt(b)}\n{t}\n"
              for i, (a, b, t) in enumerate(cues)]
    return "\n".join(blocks)


def write_webvtt(cues: list[tuple[int, int, str]]) -> str:
    def fmt(ms: int) -> str:
        h, rem = divmod(ms, 3600_000)
        mi, rem = divmod(rem, 60_000)
        s, frac = divmod(rem, 1000)
        return f"{h:02d}:{mi:02d}:{s:02d}.{frac:03d}"

    blocks = [f"{fmt(a)} --> {fmt(b)}\n{t}\n" for a, b, t in cues]
    return "WEBVTT\n\n" + "\n".join(blocks)
