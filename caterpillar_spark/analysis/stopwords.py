"""Stopword lists (standard public English lists; reference behavior:
caterpillar/processing/analysis/stopwords.py).

Words containing an apostrophe are expanded across every unicode
apostrophe variant so that e.g. ``don’t`` and ``don't`` both stop.
"""

from __future__ import annotations

import importlib.resources
import re
from typing import List

MIN_WORD_SIZE = 3  # smallest word length the standard analysers index

APOSTROPHES = "'’ʼʻ՚Ꞌꞌ＇"
_APOS_RE = re.compile("[%s]" % APOSTROPHES)


def parse_stopwords(lines) -> List[str]:
    """One stopword per line; apostrophe-bearing words are expanded to all
    apostrophe variants."""
    out: List[str] = []
    for line in lines:
        w = line.strip()
        if not w:
            continue
        if _APOS_RE.search(w):
            out.extend(_APOS_RE.sub(apos, w) for apos in APOSTROPHES)
        else:
            out.append(w)
    return out


def _load(name: str) -> List[str]:
    ref = importlib.resources.files("caterpillar_spark.resources").joinpath(name)
    return parse_stopwords(ref.read_text(encoding="utf-8").splitlines())


ENGLISH = _load("stopwords_english.txt")
ENGLISH_TEST = _load("stopwords_english_test.txt")
