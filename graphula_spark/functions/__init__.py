"""graphula_spark.functions — reusable column-level functions.

The reference has no function surface of its own (everything scalar is
delegated to Jena ARQ, SURVEY §2.2/§2.3); this module collects the
column functions this engine adds, all JVM-side expressions unless
noted. Import as:

    from graphula_spark import functions as GF
"""

from graphula_spark.operators.ann import _dot as dot_product
from graphula_spark.operators.ann import _norm as l2_norm
from graphula_spark.operators.dedup import hash60, word_shingles
from graphula_spark.operators.importance import hashed_ngram_buckets
from graphula_spark.operators.text import (
    bpe_ish_token_count,
    char_count,
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    scrub_pii,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)
from graphula_spark.operators.urls import (
    normalize_url,
    parse_url,
    registered_domain,
)
from graphula_spark.sparql.compiler import rdf_value

from pyspark.sql import Column
from pyspark.sql import functions as F


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (JVM higher-order
    fold; cast to array<double> first for stable math)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def term_is_literal(term: Column) -> Column:
    """True if a canonical term string is an RDF literal."""
    return term.startswith('"')


def term_is_blank(term: Column) -> Column:
    return term.startswith("_:")


def term_lang(term: Column) -> Column:
    """Language tag of a literal term ('' when absent)."""
    return F.regexp_extract(term, r'"@([A-Za-z0-9-]+)$', 1)


def term_datatype(term: Column) -> Column:
    """Datatype IRI of a typed literal ('' when absent)."""
    return F.regexp_extract(term, r"\^\^<([^>]*)>$", 1)


__all__ = [
    "rdf_value",
    "term_is_literal",
    "term_is_blank",
    "term_lang",
    "term_datatype",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "word_shingles",
    "tokens",
    "token_count",
    "char_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
]
