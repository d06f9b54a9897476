"""Text analysis chain: tokenizers -> filters -> analysers.

Python-3 re-implementation (from behavioral spec, not a port) of the
reference analysis chain (caterpillar/processing/analysis/).  These run
batch-at-a-time inside Arrow-backed ``mapInPandas`` on the Spark side;
nothing in this package touches Spark directly so it is unit-testable
in isolation and usable from plain Python.
"""

from caterpillar_spark.analysis.tokenize import (
    Token,
    RegexpTokenizer,
    ParagraphTokenizer,
    WordTokenizer,
    SimpleWordTokenizer,
    EverythingTokenizer,
)
from caterpillar_spark.analysis.filters import (
    PassFilter,
    LowercaseFilter,
    PositionalLowercaseWordFilter,
    StopFilter,
    OuterPunctuationFilter,
    PossessiveContractionFilter,
    SubstitutionFilter,
    SearchFilter,
    BiGramFilter,
    PotentialBiGramFilter,
)
from caterpillar_spark.analysis.analyser import (
    Analyser,
    DefaultAnalyser,
    TestAnalyser,
    BiGramAnalyser,
    PotentialBiGramAnalyser,
    EverythingAnalyser,
)

__all__ = [
    "Token",
    "RegexpTokenizer",
    "ParagraphTokenizer",
    "WordTokenizer",
    "SimpleWordTokenizer",
    "EverythingTokenizer",
    "PassFilter",
    "LowercaseFilter",
    "PositionalLowercaseWordFilter",
    "StopFilter",
    "OuterPunctuationFilter",
    "PossessiveContractionFilter",
    "SubstitutionFilter",
    "SearchFilter",
    "BiGramFilter",
    "PotentialBiGramFilter",
    "Analyser",
    "DefaultAnalyser",
    "TestAnalyser",
    "BiGramAnalyser",
    "PotentialBiGramAnalyser",
    "EverythingAnalyser",
]
