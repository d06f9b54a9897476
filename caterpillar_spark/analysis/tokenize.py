"""Tokenizers.

Behavioral spec: caterpillar/processing/analysis/tokenize.py (reference,
read-only).  Re-implemented for Python 3 — notably we do NOT reproduce
the reference's mutable-singleton ``Token`` performance hack
(tokenize.py:10-20 in the reference); tokens here are cheap immutable-ish
objects and tokenizers are plain generators, which vectorize fine inside
Arrow batches.

Pattern semantics intentionally match the reference:

* ``WordTokenizer``   — reference tokenize.py:156-197
* ``SimpleWordTokenizer`` — reference tokenize.py:200-219
* ``ParagraphTokenizer``  — reference tokenize.py:140-153
* gaps-mode segmentation  — reference tokenize.py:119-137 (including its
  edge behaviors: a leading empty segment is suppressed, the trailing
  segment is emitted only when non-empty)

We use the ``regex`` module (same engine family as the reference) so the
variable-length lookbehind in the paragraph pattern and unicode
properties behave identically.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Optional, Tuple

import regex

_FLAGS = regex.UNICODE | regex.MULTILINE | regex.DOTALL


class Token:
    """A token extracted from analysed text.

    ``position`` is the 0-based ordinal of the token within the tokenized
    value (per tokenizer call, i.e. per sentence in the framing pipeline);
    ``index`` is the (start, end) character span in the source string;
    ``stopped`` marks stop-worded tokens (they are retained in the stream
    so that position counters keep advancing — see framing).
    """

    __slots__ = ("value", "position", "stopped", "index")

    def __init__(
        self,
        value: str,
        position: Optional[int] = None,
        stopped: bool = False,
        index: Optional[Tuple[int, int]] = None,
    ):
        self.value = value
        self.position = position
        self.stopped = stopped
        self.index = index

    def copy(self) -> "Token":
        return Token(self.value, self.position, self.stopped, self.index)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Token({self.value!r}, pos={self.position}, stopped={self.stopped})"


class Tokenizer:
    """Base tokenizer contract: ``tokenize(value) -> Iterator[Token]``."""

    def tokenize(self, value: str) -> Iterator[Token]:
        raise NotImplementedError


class RegexpTokenizer(Tokenizer):
    """Regex-driven tokenizer.

    With ``gaps=False`` the pattern matches the tokens themselves; with
    ``gaps=True`` the pattern matches separators and the text between
    separators is yielded.
    """

    def __init__(self, pattern: str, gaps: bool = False, flags: int = _FLAGS):
        self._gaps = gaps
        try:
            self._re = regex.compile(pattern, flags)
        except regex.error as e:  # pragma: no cover - construction error path
            raise ValueError(f"Error in regular expression {pattern!r}: {e}")

    def tokenize(self, value: str) -> Iterator[Token]:
        if not self._gaps:
            for pos, m in enumerate(self._re.finditer(value)):
                yield Token(m.group(0), position=pos, index=(m.start(), m.end()))
            return
        # Separator (gaps) mode.  Mirrors the reference's segmentation
        # including its two quirks: a segment ending at offset 0 is
        # dropped, and the tail segment is emitted only if non-empty.
        left = 0
        last_pos = 0
        for pos, m in enumerate(self._re.finditer(value)):
            right, nxt = m.span()
            if right != 0:
                yield Token(value[left:right], position=pos, index=(left, right))
            left = nxt
            last_pos = pos
        if left != len(value):
            yield Token(value[left:], position=last_pos + 1, index=(left, len(value)))


#: Sentence-terminal characters recognised by the paragraph splitter:
#: FULL STOP, ONE DOT LEADER, SMALL FULL STOP, FULLWIDTH FULL STOP,
#: EXCLAMATION MARK, QUESTION MARK.
_SENT_BREAK_CLASS = "[.․﹒．!?]"


class ParagraphTokenizer(RegexpTokenizer):
    """Split text into paragraphs.

    A paragraph ends at (a) any newline run preceded by a sentence-break
    character possibly followed by non-space characters (e.g. ``."`` or
    ``.)``), or (b) two or more consecutive newlines (titles/headings).
    Same boundary definition as reference tokenize.py:140-153.
    """

    def __init__(self):
        super().__init__(
            rf"(?<={_SENT_BREAK_CLASS}[\S]*)\s*(?:\r?\n)+|(?:\r?\n){{2,}}",
            gaps=True,
        )


# -- Word tokenization ------------------------------------------------------
# The sub-patterns below reproduce the reference's token grammar
# (tokenize.py:156-197) in non-capturing form.

#: Multi-term proper names (``John McGee``, ``King of Scotland``,
#: abbreviated leading parts like ``Mt. Kosciuszko``); never starts with
#: ``The``/``But``; the joiner must be horizontal whitespace (not \n).
NAME_COMPOUND = (
    r"(?:(?!(?:The|But))"
    r"(?:[A-Z][a-z]+|[A-Z][a-z]{0,2}\.)"
    r"(?:[^\S\n]of)?"
    r"(?:[^\S\n][A-Z]+[A-Za-z]+)+)"
)

#: Word contractions except possessives (``I've``, ``wasn't``; ``dog's``
#: splits so the root noun survives).
CONTRACTION = r"(?:[A-Za-z]+'[A-RT-Za-rt-z]+)"

#: Emails, kept whole.
EMAIL = r"(?:\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,4}\b)"

#: Decimal/grouped numbers kept whole: 1,900 / 4.4 / 100,000,000.123
NUM = r"(?:\d+(?:[\.\,]\d+)+)"

#: Plain word; optional single leading # or @ survives (hashtags/handles).
WORD = r"(?:[#@]?\w+)"

#: URLs (scheme-ful, scheme-less www., or user@host forms).
URL = (
    r"(?:(?:(?:(?:mailto:|ftp|http(?:s?)):(?:\/\/)?)"
    r"(?:[-;:&=\+\$,\w]+@)?[A-Za-z0-9.-]+|(?:www\.|[-;:&=\+\$,\w]+@)[A-Za-z0-9.-]+)"
    r"(?:(?:\/[\+~%\/.\w\-_]*)?\??(?:[-\+=&;%@.\w_]*)#?(?:[\w]*))?)"
)


class WordTokenizer(RegexpTokenizer):
    """Word tokenizer with URL / email / number / contraction / compound-name
    special cases (reference tokenize.py:156-197)."""

    def __init__(self, detect_compound_names: bool = True):
        pattern = "|".join([URL, EMAIL, NUM, CONTRACTION, WORD])
        if detect_compound_names:
            pattern = NAME_COMPOUND + "|" + pattern
        super().__init__(pattern, gaps=False)


class SimpleWordTokenizer(RegexpTokenizer):
    """Whitespace word splitting + compound-name detection
    (reference tokenize.py:200-219)."""

    def __init__(self, detect_compound_names: bool = True):
        pattern = r"\S+"
        if detect_compound_names:
            pattern = NAME_COMPOUND + "|" + pattern
        super().__init__(pattern, gaps=False)


class EverythingTokenizer(Tokenizer):
    """Entire input value as one token (categorical/ID fields)."""

    def tokenize(self, value) -> Iterator[Token]:
        s = value if isinstance(value, str) else str(value)
        yield Token(value, position=0, stopped=False, index=(0, len(s) if value else 0))


class DateTimeTokenizer(Tokenizer):
    """Normalize datetime strings to ISO-8601 (reference tokenize.py:233-267).

    The reference uses the ``arrow`` library (unavailable here); we accept
    ISO-8601 with or without timezone via the stdlib, plus optional
    ``strptime`` format strings.  tz-aware values are normalized to UTC;
    ``ignore_tz=True`` drops the offset entirely.
    """

    def __init__(self, datetime_formats=None, ignore_tz: bool = False):
        self.datetime_formats = list(datetime_formats or [])
        self.ignore_tz = ignore_tz

    def _parse(self, value: str) -> _dt.datetime:
        v = value.strip()
        try:
            return _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            pass
        for fmt in self.datetime_formats:
            try:
                return _dt.datetime.strptime(v, fmt)
            except ValueError:
                continue
        raise ValueError(f"Cannot parse datetime value {value!r}")

    def tokenize(self, value: str) -> Iterator[Token]:
        dt = self._parse(value)
        if self.ignore_tz:
            out = dt.replace(tzinfo=None).strftime("%Y-%m-%dT%H:%M:%S")
        else:
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=_dt.timezone.utc)
            dt = dt.astimezone(_dt.timezone.utc)
            out = dt.strftime("%Y-%m-%dT%H:%M:%S+00:00")
        yield Token(out, position=0, stopped=False, index=(0, len(out)))
