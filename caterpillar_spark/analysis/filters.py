"""Token filters.

Behavioral spec: caterpillar/processing/analysis/filter.py (reference).
Filters are generator transforms ``Iterator[Token] -> Iterator[Token]``.
Unlike the reference they operate on real token objects (no shared
singleton), so downstream consumers may retain tokens freely.

Chain-order semantics that matter for index parity:

* ``StopFilter`` marks tokens stopped but does NOT drop them — stopped
  tokens still advance the in-frame position counter (reference
  filter.py:75-100 + index.py:461-470).
* ``SearchFilter`` (and thus ``OuterPunctuationFilter``) DROPS tokens
  with no match; dropped tokens never reach the position counter.
* ``PositionalLowercaseWordFilter(0)`` keys off the tokenizer-assigned
  per-sentence position, lowercasing sentence-initial Title-case single
  words so they merge with their lowercase occurrences.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Sequence

import regex

from caterpillar_spark.analysis.tokenize import Token

_FLAGS = regex.UNICODE | regex.DOTALL


class Filter:
    """Base filter contract."""

    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        raise NotImplementedError


class PassFilter(Filter):
    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        return iter(tokens)


class LowercaseFilter(Filter):
    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        for t in tokens:
            t.value = t.value.lower()
            yield t


class PositionalLowercaseWordFilter(Filter):
    """Lowercase a single-word Title-case token at a fixed stream position
    (used with position 0 to de-capitalize sentence starts)."""

    def __init__(self, position: int):
        self._position = position

    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        for t in tokens:
            if (
                t.position == self._position
                and t.value.istitle()
                and " " not in t.value
            ):
                t.value = t.value.lower()
            yield t


class StopFilter(Filter):
    """Mark (not drop) stop words and too-short tokens."""

    def __init__(self, stoplist: Iterable[str], minsize: int = 3):
        self._stopset = {s.lower() for s in stoplist}
        self._minsize = minsize

    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        for t in tokens:
            if len(t.value) < self._minsize or t.value.lower() in self._stopset:
                t.stopped = True
            yield t


class SubstitutionFilter(Filter):
    """Regex-substitute within each token's text."""

    def __init__(self, pattern: str, replacement: str):
        self._re = regex.compile(pattern, _FLAGS)
        self._replacement = replacement

    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        for t in tokens:
            t.value = self._re.sub(self._replacement, t.value)
            yield t


class SearchFilter(Filter):
    """Keep match group 0 of a regex search as the token value; tokens
    with no match are dropped from the stream entirely."""

    def __init__(self, pattern: str):
        self._re = regex.compile(pattern, _FLAGS)

    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        for t in tokens:
            m = self._re.search(t.value)
            if m:
                t.value = m.group(0)
                yield t


class OuterPunctuationFilter(SearchFilter):
    """Strip leading/trailing punctuation (and underscores) from tokens,
    optionally allowing specific leading/trailing characters through
    (reference filter.py:223-240)."""

    def __init__(
        self,
        leading_allow: Optional[Sequence[str]] = None,
        trailing_allow: Optional[Sequence[str]] = None,
    ):
        lead = (
            "[%s]*" % regex.escape("".join(leading_allow)) if leading_allow else ""
        )
        trail = (
            "[%s]" % regex.escape("".join(trailing_allow)) if trailing_allow else ""
        )
        if trail:
            pattern = r"%s[^\W_]+(?:$|.*[^\W_]%s*|%s*)" % (lead, trail, trail)
        else:
            pattern = r"%s[^\W_](?:$|.*[^\W_])" % lead
        super().__init__(pattern)


#: Every unicode apostrophe variant except U+02EE.
APOSTROPHES = "'’ʼʻ՚Ꞌꞌ＇"


class PossessiveContractionFilter(SubstitutionFilter):
    """Strip trailing possessive ``'s`` for any unicode apostrophe."""

    def __init__(self):
        super().__init__("[%s]s$" % APOSTROPHES, "")


class BiGramFilter(Filter):
    """Fuse adjacent token pairs found in a bigram allow-list into single
    tokens.  Names (leading uppercase) and stopped tokens never take part;
    a consumed left token is not reused (consume-left semantics)."""

    def __init__(self, bi_grams: Iterable[str]):
        self._bi_grams = set(bi_grams)

    def filter(self, tokens: Iterable[Token]) -> Iterator[Token]:
        pending: Optional[Token] = None
        for t in tokens:
            if (t.value and t.value[0].isupper()) or t.stopped:
                if pending is not None:
                    yield pending
                    pending = None
                yield t
                continue
            if pending is not None:
                joined = f"{pending.value} {t.value}"
                if joined in self._bi_grams:
                    t.value = joined
                    t.position = pending.position
                    if pending.index and t.index:
                        t.index = (pending.index[0], t.index[1])
                    yield t
                    pending = None
                    continue
                yield pending
            pending = t.copy()
        if pending is not None:
            yield pending


class PotentialBiGramFilter(Filter):
    """Emit candidate adjacent pairs (as 2-element lists) plus singletons;
    stopped tokens and names are never part of a candidate pair.

    NOTE: like the reference (filter.py:143-167) this yields *lists* of
    tokens, not tokens — it is a terminal stage used only by bigram
    discovery.
    """

    def filter(self, tokens: Iterable[Token]) -> Iterator[List[Token]]:
        pending: Optional[Token] = None
        for t in tokens:
            if (t.value and t.value[0].isupper()) or t.stopped:
                if pending is not None:
                    yield [pending]
                    pending = None
                yield [t]
                continue
            if pending is not None:
                yield [pending, t]
            pending = t.copy()
        if pending is not None:
            yield [pending]
