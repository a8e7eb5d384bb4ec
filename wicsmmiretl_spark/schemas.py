"""Explicit schemas for every table the engine touches.

The reference infers schemas from CSV and then fights dtype drift with
``convert_dtypes()`` (wikicaps_etl_pipeline.py:166-167, utils.py:563); here
every dataset has one declared StructType and the drift disappears — nullable
LongType holds nulls without the pandas int→float promotion.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(name, dtype, nullable=True) for name, dtype in fields])


# ---------------------------------------------------------------------------
# Reference-shaped tables (SURVEY §1.1, FIXTURES.md §A)
# ---------------------------------------------------------------------------

# Raw WikiCaps caption list: id|||File:x.jpg|||caption
# (wikicaps_etl_pipeline.py:110-116)
WIKICAPS_RAW = _struct(
    ("wikicaps_id", LongType()),
    ("wikimedia_file", StringType()),
    ("caption", StringType()),
)

# Enriched metadata: raw columns + generate_caption_stats output
# (utils.py:530-561, README.md:31-58)
CAPTION_METADATA = _struct(
    ("wikicaps_id", LongType()),
    ("wikimedia_file", StringType()),
    ("caption", StringType()),
    ("num_tok", IntegerType()),
    ("num_sent", IntegerType()),
    ("min_sent_len", IntegerType()),
    ("max_sent_len", IntegerType()),
    ("num_ne", IntegerType()),
    ("ne_texts", ArrayType(StringType())),
    ("ne_types", ArrayType(StringType())),
    ("num_nouns", IntegerType()),
    ("num_propn", IntegerType()),
    ("num_conj", IntegerType()),
    ("num_verb", IntegerType()),
    ("num_sym", IntegerType()),
    ("num_num", IntegerType()),
    ("num_adp", IntegerType()),
    ("num_adj", IntegerType()),
    ("ratio_ne_tok", DoubleType()),
    ("ratio_noun_tok", DoubleType()),
    ("ratio_propn_tok", DoubleType()),
    ("ratio_all_noun_tok", DoubleType()),
    ("fk_re_score", DoubleType()),
    ("fk_gl_score", DoubleType()),
    ("dc_score", DoubleType()),
    ("image_path", StringType()),
)

# Vocabulary: (token, pos) -> count (utils.py:170-178)
VOCAB = _struct(
    ("token", StringType()),
    ("pos", StringType()),
    ("count", LongType()),
)

# Binary multimodal column (north star; images held in-plan, not on local disk
# like utils.py:64-73)
IMAGES = _struct(
    ("wikicaps_id", LongType()),
    ("content", BinaryType()),
    ("format", StringType()),
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*, TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = _struct(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _struct(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _struct(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _struct(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _struct(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _struct(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _struct(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

EVENTS = _struct(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _struct(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _struct(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
