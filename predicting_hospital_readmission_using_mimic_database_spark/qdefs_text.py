"""Text query definitions: SURVEY.md §2.7 T1-T13 over the ``documents``
table, each with a DuckDB oracle.

The harness documents are clean word-soup (no punctuation / digits /
newlines / NULLs), so entries that exercise scrubbing inject the SAME
deterministic noise on both engines (a literal suffix + a modular NULL)
— the operator under test then has real work to do and the oracle still
hash-matches.

Cross-engine regex parity notes:
- Spark ``regexp_replace`` is global; DuckDB needs the explicit ``'g'``
  flag — every oracle passes it;
- token arrays are compared as space-joined strings (``array_join`` /
  ``array_to_string``) so value normalization is engine-independent.

Reference call-sites: py:102-106 (T1/T2), py:126 (T3), py:125,289 (T4),
py:290-291 (T5), py:255-256 (T6), py:300-310 (T7-T13 ``clean_textmain``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions import text as TX
from .registry import query
from .sources.io import read_table


def _docs(spark, sf):
    return read_table(spark, sf, "documents")


#: deterministic noise appended to ``text`` so scrub/tokenize ops have
#: punctuation, digits, newlines and mixed case to chew on (both engines
#: build the identical string)
_NOISE = " 123 \nEnd-Of-Doc!! (v2.0) [ok] {fine} ~tail\rCR"
_NOISE_SQL = (
    "' 123 ' || chr(10) || 'End-Of-Doc!! (v2.0) [ok] {fine} ~tail' || chr(13) || 'CR'"
)
_NOISY_SQL = f"text || {_NOISE_SQL}"


def _noisy(col="text"):
    return F.concat(F.col(col), F.lit(_NOISE))


# T13 lemmatizer as DuckDB lambda SQL: BOTH the exception map and the
# suffix CASE chain are GENERATED from functions.irregular_nouns
# (NOUN_EXCEPTIONS + NOUN_SUFFIX_RULES) — the same data the Spark
# lemmatizer compiles, so the two engines cannot drift.
from .functions.irregular_nouns import (
    NOUN_EXCEPTIONS as _NOUN_EXC,
    NOUN_SUFFIX_RULES as _NOUN_RULES,
)


def _noun_rule_case_sql() -> str:
    # compiled from the same STRUCTURED spec as the Spark side:
    # ends_with/left/translate — no per-token regex on either engine
    parts = []
    for suffixes, min_len, strip_n, append, lower_alpha in _NOUN_RULES:
        cond = " OR ".join(f"ends_with(w, '{s}')" for s in suffixes)
        cond = f"({cond})" if len(suffixes) > 1 else cond
        if min_len:
            cond = f"length(w) >= {min_len} AND {cond}"
        if lower_alpha:
            cond = f"{cond} AND translate(w, 'abcdefghijklmnopqrstuvwxyz', '') = ''"
        if strip_n == 0:
            val = "w"
        else:
            val = f"left(w, length(w) - {strip_n})"
            if append:
                val = f"{val} || '{append}'"
        parts.append(f"WHEN {cond} THEN {val}")
    return "CASE " + " ".join(parts) + " ELSE w END"


# braces doubled: _LEMMA_SQL goes through str.format(toks=...)
_EXC_MAP_SQL = (
    "MAP {{"
    + ", ".join(f"'{k}': '{v}'" for k, v in _NOUN_EXC.items())
    + "}}"
)
_LEMMA_SQL = (
    "list_transform({toks}, w -> coalesce("
    "map_extract(" + _EXC_MAP_SQL + ", w)[1], "
    + _noun_rule_case_sql().replace("{", "{{").replace("}", "}}")
    + "))"
)

_TOKENIZE_SQL = "list_filter(string_split_regex({x}, '\\W+'), t -> t <> '')"
_ALPHA_SQL = "list_filter({toks}, t -> regexp_matches(t, '^[a-zA-Z]+$'))"
_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS) + "]"
_STOP_SQL = f"list_filter({{toks}}, t -> NOT list_contains({_STOP_LIST_SQL}, t))"


@query(
    "t1_regex_recode",
    oracle="""
    SELECT doc_id,
           CASE WHEN regexp_matches(source, '^src1[0-9]')
                THEN 'SRC_TEEN' ELSE source END AS src_recode
    FROM documents
    """,
)
def q_t1(spark, sf):
    # whole-value collapse on (unanchored) match — engine semantics per
    # functions.text.regex_recode; pattern anchored by the caller
    d = _docs(spark, sf)
    return d.select("doc_id", TX.regex_recode("source", r"^src1[0-9]", "SRC_TEEN").alias("src_recode"))


@query(
    "t2_multi_recode",
    oracle="""
    SELECT doc_id,
           CASE WHEN lang IN ('zh', 'fr') THEN 'OTHER/UNKNOWN' ELSE lang END AS lang_grp
    FROM documents
    """,
)
def q_t2(spark, sf):
    d = _docs(spark, sf)
    mapping = {"zh": "OTHER/UNKNOWN", "fr": "OTHER/UNKNOWN"}
    return d.select("doc_id", TX.multi_recode("lang", mapping).alias("lang_grp"))


@query(
    "t3_substr_prefix",
    oracle="SELECT doc_id, substr(text, 1, 3) AS prefix3 FROM documents",
)
def q_t3(spark, sf):
    return _docs(spark, sf).select("doc_id", TX.substr_prefix("text", 3).alias("prefix3"))


@query(
    "t4_fill_null",
    oracle="""
    SELECT doc_id,
           coalesce(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END, '999') AS lang_filled
    FROM documents
    """,
)
def q_t4(spark, sf):
    # modular NULL injection (documents.lang has no NULLs at any sf)
    d = _docs(spark, sf)
    lang_gap = F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang"))
    return d.select("doc_id", TX.fill_null(lang_gap, "999").alias("lang_filled"))


@query(
    "t5_scrub_newlines",
    oracle=f"""
    SELECT doc_id,
           replace(replace({_NOISY_SQL}, chr(10), ' '), chr(13), ' ') AS scrubbed
    FROM documents
    """,
)
def q_t5(spark, sf):
    return _docs(spark, sf).select("doc_id", TX.scrub_newlines(_noisy()).alias("scrubbed"))


@query(
    "t6_contains_frac",
    oracle=f"""
    SELECT CAST(count(*) FILTER (WHERE contains({_NOISY_SQL}, chr(10))) AS BIGINT) AS n_with_nl,
           round(avg(CASE WHEN contains({_NOISY_SQL}, chr(10)) THEN 1.0 ELSE 0.0 END), 4)
             AS frac_with_nl
    FROM documents
    """,
)
def q_t6(spark, sf):
    # py:255-256: fraction of notes containing '\n'
    d = _docs(spark, sf)
    has = TX.contains_str(_noisy(), "\n").cast("int")
    return d.agg(
        F.sum(has).cast("long").alias("n_with_nl"),
        F.round(F.avg(has.cast("double")), 4).alias("frac_with_nl"),
    )


@query(
    "t7_lower",
    oracle=f"SELECT doc_id, lower(upper({_NOISY_SQL})) AS lowered FROM documents",
)
def q_t7(spark, sf):
    # upper() first so the op has case to normalize
    return _docs(spark, sf).select(
        "doc_id", F.lower(F.upper(_noisy())).alias("lowered")
    )


@query(
    "t8_strip_punct",
    oracle=f"""
    SELECT doc_id,
           regexp_replace({_NOISY_SQL}, '[!-/:-@\\[-`{{-~]', '', 'g') AS no_punct
    FROM documents
    """,
)
def q_t8(spark, sf):
    return _docs(spark, sf).select("doc_id", TX.strip_punct(_noisy()).alias("no_punct"))


@query(
    "t9_strip_digits",
    oracle=f"""
    SELECT doc_id, regexp_replace({_NOISY_SQL}, '[0-9]+', '', 'g') AS no_digits
    FROM documents
    """,
)
def q_t9(spark, sf):
    return _docs(spark, sf).select("doc_id", TX.strip_digits(_noisy()).alias("no_digits"))


@query(
    "t10_tokenize",
    oracle=f"""
    SELECT doc_id,
           array_to_string({_TOKENIZE_SQL.format(x=_NOISY_SQL)}, ' ') AS tokens
    FROM documents
    """,
)
def q_t10(spark, sf):
    toks = TX.tokenize(_noisy())
    return _docs(spark, sf).select("doc_id", F.array_join(toks, " ").alias("tokens"))


@query(
    "t11_alpha_only",
    oracle=f"""
    SELECT doc_id,
           array_to_string(
             {_ALPHA_SQL.format(toks=_TOKENIZE_SQL.format(x=_NOISY_SQL))}, ' ') AS alpha_tokens
    FROM documents
    """,
)
def q_t11(spark, sf):
    toks = TX.alpha_only(TX.tokenize(_noisy()))
    return _docs(spark, sf).select("doc_id", F.array_join(toks, " ").alias("alpha_tokens"))


@query(
    "t12_drop_stopwords",
    oracle=f"""
    SELECT doc_id,
           array_to_string(
             {_STOP_SQL.format(toks=_TOKENIZE_SQL.format(x="text"))}, ' ') AS content_tokens
    FROM documents
    """,
)
def q_t12(spark, sf):
    toks = TX.drop_stopwords(TX.tokenize(F.col("text")))
    return _docs(spark, sf).select("doc_id", F.array_join(toks, " ").alias("content_tokens"))


def clean_tokens_sql(x_sql: str) -> str:
    """DuckDB SQL for the full clean-text token pipeline over the string
    expression ``x_sql`` — mirrors :func:`TX.clean_text_tokens` exactly.
    Shared by the T13 oracle here and the T14/T15 oracles in qdefs_ml."""
    cleaned = (
        "regexp_replace(regexp_replace(lower(" + x_sql + "), "
        "'[!-/:-@\\[-`{-~]', '', 'g'), '[0-9]+', '', 'g')"
    )
    return _LEMMA_SQL.format(
        toks=_STOP_SQL.format(
            toks=_ALPHA_SQL.format(toks=_TOKENIZE_SQL.format(x=cleaned))
        )
    )


_T13_PIPE_SQL = clean_tokens_sql(_NOISY_SQL)


@query(
    "t13_clean_text_tokens",
    oracle=f"""
    SELECT doc_id, array_to_string({_T13_PIPE_SQL}, ' ') AS clean_tokens
    FROM documents
    """,
)
def q_t13(spark, sf):
    # the full clean_textmain analyzer (py:300-310) as one JVM-side plan
    toks = TX.clean_text_tokens(_noisy())
    return _docs(spark, sf).select("doc_id", F.array_join(toks, " ").alias("clean_tokens"))


# Verb-mode lemmatizer (T18, beyond-reference — the reference's
# wn.lemmatize(word) runs at NLTK's default pos='n', so T13 keeps noun
# parity and the verb morphology ships as its own operator). SQL compiled
# from the SAME module constants as the Spark side (irregular_verbs.py).
from .functions.irregular_verbs import ED_RESTORE_RE as _ED_RE
from .functions.irregular_verbs import ING_RESTORE_RE as _ING_RE
from .functions.irregular_verbs import PROTECTED as _VPROT
from .functions.irregular_verbs import S_STRIP_EXCLUDE_RE as _SX_RE
from .functions.irregular_verbs import VERB_EXCEPTIONS as _VERB_EXC

_VEXC_MAP_SQL = (
    "MAP {{"
    + ", ".join(f"'{k}': '{v}'" for k, v in _VERB_EXC.items())
    + "}}"
)
_VPROT_SQL = "[" + ", ".join(f"'{w}'" for w in _VPROT) + "]"
_VLEMMA_SQL = (
    "list_transform({toks}, w -> coalesce("
    "map_extract(" + _VEXC_MAP_SQL + ", w)[1], CASE "
    f"WHEN list_contains({_VPROT_SQL}, w) THEN w "
    "WHEN len(w) >= 6 AND regexp_matches(w, 'ied$') THEN regexp_replace(w, 'ied$', 'y') "
    "WHEN regexp_matches(w, 'ied$') THEN substr(w, 1, len(w)-1) "
    "WHEN len(w) >= 5 AND regexp_matches(w, 'ies$') THEN regexp_replace(w, 'ies$', 'y') "
    "WHEN regexp_matches(w, '(ss|ch|sh|x|zz|o)es$') THEN substr(w, 1, len(w)-2) "
    "WHEN len(w) >= 4 AND regexp_matches(w, 'es$') THEN substr(w, 1, len(w)-1) "
    f"WHEN len(w) >= 4 AND regexp_matches(w, '[a-z]s$') AND NOT regexp_matches(w, '{_SX_RE}') "
    "THEN substr(w, 1, len(w)-1) "
    f"WHEN len(w) >= 5 AND regexp_matches(w, '{_ED_RE}') THEN substr(w, 1, len(w)-1) "
    "WHEN len(w) >= 5 AND regexp_matches(w, 'ed$') THEN substr(w, 1, len(w)-2) "
    f"WHEN len(w) >= 6 AND regexp_matches(w, '{_ING_RE}') THEN substr(w, 1, len(w)-3) || 'e' "
    "WHEN len(w) >= 5 AND regexp_matches(w, 'ing$') THEN substr(w, 1, len(w)-3) "
    "ELSE w END))"
)

_T18_TOKS_SQL = _ALPHA_SQL.format(
    toks=_TOKENIZE_SQL.format(x=f"lower({_NOISY_SQL})")
)


@query(
    "t18_lemmatize_verbs",
    oracle=f"""
    SELECT doc_id,
           array_to_string({_VLEMMA_SQL.format(toks=_T18_TOKS_SQL)}, ' ')
             AS verb_lemmas
    FROM documents
    """,
)
def q_t18(spark, sf):
    # lower -> tokenize -> alpha -> verb-mode lemmatize, one JVM-side plan
    toks = TX.alpha_only(TX.tokenize(F.lower(_noisy())))
    out = TX.lemmatize_verb_rules(toks)
    return _docs(spark, sf).select("doc_id", F.array_join(out, " ").alias("verb_lemmas"))


@query(
    "t19_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                    t -> t <> '')) AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 256 AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM tok GROUP BY 1, 2
    """,
)
def q_t19(spark, sf):
    """T19 — hashing-trick features (ml.features.hash_features, 256
    buckets over whitespace tokens): the fit-free CountVectorizer
    alternative — no vocab aggregation pass, no broadcast dictionary,
    fixed output dimension at any corpus size. md5-derived buckets make
    the mapping engine-independent, so DuckDB reproduces every (doc,
    bucket, count) triple exactly."""
    from .ml import features as FEH
    from .operators.textstats import _words

    d = read_table(spark, sf, "documents").select(
        "doc_id", _words("text").alias("toks")
    )
    return FEH.hash_features(d, "doc_id", "toks", n_features=256)


@query(
    "t20_bpe_pair_counts",
    oracle="""
    WITH v AS (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                    t -> t <> '')) AS word
      FROM documents
    ), vc AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY word
    ), s AS (
      SELECT n, list_append(regexp_extract_all(word, '.'), '</w>') AS syms
      FROM vc
    ), p AS (
      SELECT n, syms[i] AS a, syms[i+1] AS b
      FROM s, unnest(generate_series(1, len(syms) - 1)) u(i)
    )
    SELECT a, b, CAST(sum(n) AS BIGINT) AS cnt
    FROM p GROUP BY a, b
    ORDER BY cnt DESC, a, b LIMIT 20
    """,
)
def q_t20(spark, sf):
    """T20 — the BPE training kernel (ml.bpe.pair_counts): corpus-
    weighted adjacent-symbol-pair frequencies over the distinct-word
    vocab — the per-iteration statistic `bpe_train` argmaxes. The
    two-level shape is the scale story: the corpus aggregates ONCE into
    (word, count); every one of the tokenizer's thousand merge
    iterations then runs over the vocab frame, bounded by distinct-word
    count, not corpus bytes. Top-20 with a full deterministic tiebreak
    (cnt DESC, a, b) so the LIMIT cut is engine-independent; the
    iterative trainer itself is pinned to a local reference
    implementation in tests/test_ml.py."""
    from .ml.bpe import pair_counts, vocab_table

    d = read_table(spark, sf, "documents").select("text")
    pc = pair_counts(vocab_table(d, "text"))
    return (
        pc.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(20)
        .select("a", "b", F.col("cnt").cast("long").alias("cnt"))
    )


#: t21 fixed merge list (rank = position). Deliberately includes a
#: rank-INVERSION: rank 0 ("ta"+"ble</w>") only becomes applicable after
#: the higher-rank merges 3/4/5/6 build its components, so sequential
#: rank-order application would miss it — only the true greedy
#: lowest-rank-first loop produces "table</w>" (and "s table</w>" for
#: "stable"), which is exactly what the oracle must reproduce.
_T21_MERGES: list[tuple[str, str]] = [
    ("ta", "ble</w>"),
    ("s", "c"),
    ("sc", "a"),
    ("t", "a"),
    ("b", "le</w>"),
    ("l", "e"),
    ("le", "</w>"),
    ("k", "e"),
    ("ke", "y"),
    ("key", "</w>"),
    ("a", "</w>"),
    ("t", "h"),
    ("th", "e"),
    ("the", "</w>"),
]

#: symbols never contain whitespace (words are split on it), so "a b" is
#: an unambiguous pair key for the SQL-side rank map
_T21_RANKMAP = (
    "MAP {"
    + ", ".join(f"'{a} {b}': {r}" for r, (a, b) in enumerate(_T21_MERGES))
    + "}"
)

_T21_SQL = f"""
    WITH RECURSIVE
    wl AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS words
      FROM documents
    ),
    w AS (
      SELECT doc_id, i AS wpos, words[i] AS word
      FROM wl, unnest(generate_series(1, len(words))) u(i)
    ),
    vw AS (SELECT DISTINCT word FROM w),
    enc AS (
      SELECT word, list_append(regexp_extract_all(word, '.'), '</w>') AS syms
      FROM vw
      UNION ALL
      SELECT word,
             syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:] AS syms
      FROM (
        SELECT word, syms, list_min(rs) AS mr,
               list_position(rs, list_min(rs)) AS bi
        FROM (
          SELECT word, syms,
                 list_transform(generate_series(1, len(syms) - 1),
                    i -> coalesce(({_T21_RANKMAP})[syms[i] || ' ' || syms[i+1]][1],
                                  1000000)) AS rs
          FROM enc
        )
      ) WHERE mr < 1000000
    ),
    fin AS (
      SELECT word, syms FROM (
        SELECT word, syms,
               coalesce(list_min(list_transform(generate_series(1, len(syms) - 1),
                  i -> coalesce(({_T21_RANKMAP})[syms[i] || ' ' || syms[i+1]][1],
                                1000000))), 1000000) AS mr
        FROM enc
      ) WHERE mr >= 1000000
    )
    SELECT w.doc_id,
           CAST(sum(len(f.syms)) AS BIGINT) AS n_tokens,
           string_agg(array_to_string(f.syms, ' '), ' ' ORDER BY w.wpos) AS toks
    FROM w JOIN fin f USING (word)
    GROUP BY w.doc_id
"""


@query("t21_bpe_encode", oracle=_T21_SQL)
def q_t21(spark, sf):
    """T21 — the SERVING half of the tokenizer (ml.bpe.bpe_encode):
    greedy lowest-rank-first merge segmentation with a fixed rank-ordered
    merge list shipped in the Arrow-batch closure (fit-small/
    transform-wide — the merge dict is O(vocab), the corpus never
    collects). The merge list plants a rank INVERSION (rank 0 applies
    only after ranks 3-6 build its components), so the entry separates
    the true greedy loop from naive sequential rank application; the
    DuckDB oracle replays the exact loop as a recursive CTE over DISTINCT
    words (leftmost-minimal-rank merge per step) and reassembles per-doc
    token streams. Map-only at any corpus size: zero shuffles besides the
    per-doc output agg."""
    from .ml.bpe import bpe_encode

    d = read_table(spark, sf, "documents").select("doc_id", "text")
    enc = bpe_encode(d, "doc_id", "text", _T21_MERGES)
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", " ").alias("toks"),
    )
