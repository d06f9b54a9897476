"""Declared index Schema / FieldType layer.

Reference parity: ``processing/schema.py:25-330`` (the FieldType
hierarchy, per-type FIELD_OPS support, and the Schema container) and
``processing/index.py:1382-1428`` (``_validate_analyse_metadata`` —
metadata search specs are validated against the schema and their
values *analysed* by the field type before any execution).

Spark-first restatement: a FieldType here does three jobs —

1. **declare** how a field participates in the index (``indexed`` /
   ``categorical`` / ``stored`` flags, and for TEXT fields which
   analyser chain frames it);
2. **validate + analyse** metadata query specs driver-side
   (:func:`validate_metadata`): unknown fields, non-indexed fields and
   type-unsupported operators fail fast with typed errors instead of a
   late AnalysisException or a silent mis-compare, and query values are
   normalized exactly like ingest values (CATEGORICAL_TEXT strips,
   NUMERIC coerces, DATETIME normalizes to ISO-8601 UTC via
   :class:`~caterpillar_spark.analysis.tokenize.DateTimeTokenizer`);
3. **normalize ingest columns** JVM-side
   (:func:`normalize_metadata_columns`) so stored values and analysed
   query values are directly comparable in the parquet scan — the
   normalization is plain Catalyst expressions (trim / cast /
   date_format), never a Python UDF.

Deviation (documented): the reference's metadata search rejects ``*=``
(``valid_metadata_operators``, index.py:1393) even though
CATEGORICAL_TEXT implements ``equals_wildcard`` for attribute use
(schema.py:200-201).  Here ``*=`` is searchable on CATEGORICAL_TEXT
fields with the reference's ``re.match`` semantics — the pattern is
anchored at the start of the value, compiled to an anchored ``RLIKE``
executed inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, functions as F

from caterpillar_spark.analysis.analyser import Analyser, DefaultAnalyser
from caterpillar_spark.analysis.tokenize import DateTimeTokenizer


class FieldConfigurationError(Exception):
    """Invalid Schema construction (reference schema.py:21)."""


class UnknownFieldError(KeyError):
    """Metadata search names a field the schema does not define."""


class NonIndexedFieldError(ValueError):
    """Metadata search names a field that is not indexed structured
    data (TEXT fields are searched through terms, not metadata)."""


class NonSearchableOperatorError(ValueError):
    """Operator is not a metadata-search operator at all."""


class UnsupportedOperatorError(ValueError):
    """Operator exists but this field's type does not support it."""


#: Every operator metadata search understands.  ``in`` is a
#: multi-value ``=`` (reference index.py:1393); ``*=`` is the
#: documented CATEGORICAL_TEXT extension.
SEARCH_OPS = ("<", "<=", ">", ">=", "=", "in", "*=")


class FieldType:
    """Base field configuration (reference schema.py:25-107).

    ``ops`` is the subset of :data:`SEARCH_OPS` the type supports —
    the Spark analog of the reference's NotImplementedError-raising
    operator methods.
    """

    ops: frozenset = frozenset()

    def __init__(self, analyser: Optional[Analyser] = None, indexed: bool = False,
                 categorical: bool = False, stored: bool = True):
        self.analyser = analyser
        self.indexed = indexed
        self.categorical = categorical
        self.stored = stored

    def analyse_value(self, value):
        """Normalize one query/ingest value like the reference's
        ``FieldType.analyse`` + ``value_of`` (schema.py:55-58,
        115-117)."""
        return value

    def normalize_col(self, col: Column) -> Column:
        """JVM-side ingest normalization matching :meth:`analyse_value`."""
        return col

    def __repr__(self):  # pragma: no cover - debug aid
        return (f"{type(self).__name__}(indexed={self.indexed}, "
                f"categorical={self.categorical}, stored={self.stored})")


class TEXT(FieldType):
    """Analysed full-text field (reference schema.py:181-189).  Not
    metadata-searchable: queries reach it through terms."""

    ops = frozenset()

    def __init__(self, analyser: Optional[Analyser] = None, indexed: bool = True,
                 stored: bool = True):
        super().__init__(analyser=analyser or DefaultAnalyser(), indexed=indexed,
                         categorical=False, stored=stored)


class CATEGORICAL_TEXT(FieldType):
    """Stripped, unanalysed categorical string (reference
    schema.py:192-201): supports ``=``/``in`` and anchored-regex
    ``*=``."""

    ops = frozenset({"=", "in", "*="})

    def __init__(self, indexed: bool = False, stored: bool = True):
        super().__init__(indexed=indexed, categorical=True, stored=stored)

    def analyse_value(self, value):
        return value.strip() if isinstance(value, str) else value

    def normalize_col(self, col: Column) -> Column:
        return F.trim(col)


class ID(FieldType):
    """Whole-value token, e.g. a file path (reference schema.py:123-130)."""

    ops = frozenset({"=", "in"})

    def __init__(self, indexed: bool = False, stored: bool = True):
        super().__init__(indexed=indexed, categorical=True, stored=stored)


class NUMERIC(FieldType):
    """Int or float field (reference schema.py:133-164): equality and
    range operators, values coerced to ``num_type``."""

    ops = frozenset({"=", "in", "<", "<=", ">", ">="})
    TYPES = (int, float)

    def __init__(self, indexed: bool = False, stored: bool = True,
                 num_type=int, default_value=None):
        if num_type not in NUMERIC.TYPES:
            raise ValueError(f"Invalid num_type {num_type!r}")
        super().__init__(indexed=indexed, categorical=True, stored=stored)
        self.num_type = num_type
        self.default_value = default_value

    def analyse_value(self, value):
        try:
            return self.num_type(value)
        except (TypeError, ValueError):
            if value is None or (hasattr(value, "__len__") and len(value) == 0):
                return self.default_value
            raise

    def normalize_col(self, col: Column) -> Column:
        # try_cast: malformed/empty values become NULL (then the default)
        # instead of an ANSI-mode cast error — mirrors analyse_value's
        # empty -> default_value behavior (reference schema.py:145-152).
        out = col.try_cast("double" if self.num_type is float else "long")
        if self.default_value is not None:
            out = F.coalesce(out, F.lit(self.default_value))
        return out


class BOOLEAN(FieldType):
    """Boolean field (reference schema.py:167-178)."""

    ops = frozenset({"=", "in"})

    def __init__(self, indexed: bool = False, stored: bool = True):
        super().__init__(indexed=indexed, categorical=True, stored=stored)

    def analyse_value(self, value):
        return bool(value)

    def normalize_col(self, col: Column) -> Column:
        return col.cast("boolean")


class DATETIME(FieldType):
    """Datetime stored as ISO-8601 UTC text, lexicographically
    comparable (reference schema.py:204-233).  Query values are
    normalized through the same
    :class:`~caterpillar_spark.analysis.tokenize.DateTimeTokenizer`
    the ingest path uses, so string comparison is order-exact."""

    ops = frozenset({"=", "in", "<", "<=", ">", ">="})

    def __init__(self, indexed: bool = False, stored: bool = True,
                 datetime_formats: Optional[Sequence[str]] = None,
                 ignore_tz: bool = False):
        super().__init__(indexed=indexed, categorical=True, stored=stored)
        self._tokenizer = DateTimeTokenizer(
            datetime_formats=datetime_formats, ignore_tz=ignore_tz
        )

    def analyse_value(self, value):
        if value is None:
            return None
        if not isinstance(value, str):
            value = value.isoformat()  # datetime/date objects
        return next(iter(self._tokenizer.tokenize(value))).value

    def normalize_col(self, col: Column) -> Column:
        # timestamp columns render as ISO-8601 UTC text; string columns
        # are assumed already normalized (ingest through analyse_value
        # or an ISO-producing source).
        return F.when(
            col.cast("timestamp").isNotNull(),
            F.date_format(
                F.to_utc_timestamp(col.cast("timestamp"),
                                   F.current_timezone()),
                "yyyy-MM-dd'T'HH:mm:ss+00:00",
            ),
        ).otherwise(col.cast("string"))


class Schema:
    """Field-name -> FieldType mapping (reference schema.py:236-330).

    Field types may be passed as instances or classes (instantiated
    with defaults)::

        Schema(text=TEXT, lang=CATEGORICAL_TEXT(indexed=True),
               n_chars=NUMERIC(indexed=True))
    """

    def __init__(self, **fields):
        self._fields: Dict[str, FieldType] = {}
        for name in sorted(fields):
            self.add(name, fields[name])

    def add(self, name: str, field_type) -> None:
        if name.startswith("_"):
            raise FieldConfigurationError(
                "Field names cannot start with an underscore")
        if name in self._fields:
            raise FieldConfigurationError(f"Schema already has a field {name}")
        if isinstance(field_type, type):
            if not issubclass(field_type, FieldType):
                raise FieldConfigurationError(
                    f"{field_type!r} is not a FieldType")
            try:
                field_type = field_type()
            except Exception as e:  # mirror reference error wrapping
                raise FieldConfigurationError(
                    f"Error {e!r} instantiating field {name}")
        if not isinstance(field_type, FieldType):
            raise FieldConfigurationError(
                f"{field_type!r} is not a FieldType object")
        self._fields[name] = field_type

    def __iter__(self) -> Iterator[FieldType]:
        return iter(self._fields.values())

    def __getitem__(self, name: str) -> FieldType:
        try:
            return self._fields[name]
        except KeyError:
            raise KeyError(f"No field named {name}")

    def __len__(self) -> int:
        return len(self._fields)

    def __contains__(self, name: str) -> bool:
        return name in self._fields

    def names(self) -> List[str]:
        return sorted(self._fields)

    def items(self) -> List[Tuple[str, FieldType]]:
        return sorted(self._fields.items())

    def get_indexed_text_fields(self) -> List[str]:
        return [n for n, f in self._fields.items()
                if f.indexed and type(f) is TEXT]

    def get_indexed_structured_fields(self) -> List[str]:
        return [n for n, f in self._fields.items()
                if f.indexed and type(f) is not TEXT]

    def stored_fields(self) -> List[str]:
        return [n for n, f in self._fields.items() if f.stored]


def validate_metadata(schema: Schema, metadata: Dict[str, Dict[str, object]]
                      ) -> Dict[str, Dict[str, object]]:
    """Validate a metadata search spec against ``schema`` and analyse
    its values (reference ``_validate_analyse_metadata``,
    index.py:1382-1428).  Returns the analysed spec; raises the typed
    errors above on any invalid field/operator."""
    structured = set(schema.get_indexed_structured_fields())
    analysed: Dict[str, Dict[str, object]] = {}
    for field, conds in metadata.items():
        if field not in structured:
            if field in schema:
                raise NonIndexedFieldError(
                    f"{field!r} is not an indexed structured data field")
            raise UnknownFieldError(
                f"{field!r} is not defined on this index")
        ftype = schema[field]
        analysed[field] = {}
        for op, value in conds.items():
            if op not in SEARCH_OPS:
                raise NonSearchableOperatorError(
                    f"Operator {op!r} not available for search")
            if op not in ftype.ops:
                raise UnsupportedOperatorError(
                    f"Operator {op!r} not supported by field {field!r} "
                    f"({type(ftype).__name__})")
            if op == "in":
                analysed[field][op] = [ftype.analyse_value(v) for v in value]
            elif op == "*=":
                analysed[field][op] = value  # the regex, not a field value
            else:
                analysed[field][op] = ftype.analyse_value(value)
    return analysed


def normalize_metadata_columns(df: DataFrame, schema: Schema) -> DataFrame:
    """Apply each structured field's JVM-side ingest normalization to
    its column (columns absent from ``df`` are ignored)."""
    for name, ftype in schema.items():
        if type(ftype) is not TEXT and name in df.columns:
            df = df.withColumn(name, ftype.normalize_col(F.col(name)))
    return df


def build_frames_for_schema(
    df: DataFrame,
    schema: Schema,
    doc_id_col: str = "doc_id",
    frame_size: int = 2,
    store_text: bool = True,
) -> DataFrame:
    """Frame a document table as its declared schema directs: one
    framing pass per indexed TEXT field with that field's analyser,
    unioned; indexed structured fields ride along as denormalized
    metadata columns (normalized first).  Each pass is the same
    shuffle-free ``mapInPandas`` as :func:`~caterpillar_spark.framing.
    build_frames`."""
    from caterpillar_spark.framing import build_frames

    text_fields = schema.get_indexed_text_fields()
    if not text_fields:
        raise FieldConfigurationError("schema has no indexed TEXT field")
    meta = schema.get_indexed_structured_fields()
    df = normalize_metadata_columns(df, schema)
    out = None
    for name in sorted(text_fields):
        part = build_frames(
            df,
            text_cols=[name],
            doc_id_col=doc_id_col,
            analyser=schema[name].analyser,
            frame_size=frame_size,
            metadata_cols=meta,
            store_text=store_text,
        )
        out = part if out is None else out.unionByName(part)
    return out
