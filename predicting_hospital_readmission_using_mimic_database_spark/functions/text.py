"""String / text expression builders (SURVEY.md §2.7, T1-T13).

The reference's text surface is (a) regex recodes of categorical columns
(py:102-106), (b) ICD-9 string slicing (py:126), (c) the ``clean_textmain``
analyzer (py:300-310): lower -> strip punctuation -> strip digits -> split on
non-word -> keep alphabetic -> drop stopwords -> lemmatize. All but the
lemmatizer are JVM-side built-ins here (whole-stage codegen); the lemmatizer
is a rule-based suffix stripper expressed with higher-order array functions —
if NLTK's WordNet is importable we expose a pandas_udf variant too
(``lemmatize_udf``), but the engine default never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def regex_recode(value: ColumnOrName, pattern: str, replacement: str) -> Column:
    """T1 — anchored regex collapse (py:102-105, e.g. ``^ASIAN\\D*`` -> ASIAN).

    pandas ``Series.replace(regex=...)`` replaces only the matched span; the
    ENGINE semantics pinned here are whole-value-replace-on-match: if the
    (unanchored) ``rlike(pattern)`` hits anywhere, the entire value becomes
    ``replacement``. Callers should anchor patterns (``^ASIAN\\D*``) when
    they mean prefix-match; for the reference's MIMIC values the two agree
    because the matched span is the whole string.
    """
    v = _col(value)
    return F.when(v.rlike(pattern), F.lit(replacement)).otherwise(v)


def multi_recode(value: ColumnOrName, mapping: dict[str, str]) -> Column:
    """T2 — many-literal -> one replacement (py:106)."""
    v = _col(value)
    expr = None
    for src, dst in mapping.items():
        cond = v == F.lit(src)
        expr = F.when(cond, F.lit(dst)) if expr is None else expr.when(cond, F.lit(dst))
    return v if expr is None else expr.otherwise(v)


def substr_prefix(value: ColumnOrName, n: int) -> Column:
    """T3 — first-n-chars slice (py:126 ``str.slice(0,3)``)."""
    return F.substring(_col(value), 1, n)


def fill_null(value: ColumnOrName, filler: str) -> Column:
    """T4 — fillna on a string column (py:125, py:289)."""
    return F.coalesce(_col(value), F.lit(filler))


def contains_str(value: ColumnOrName, needle: str) -> Column:
    """T6 — substring-contains predicate (py:255-256 ``str.contains('\\n')``
    fraction). Plain ``contains`` — no regex interpretation."""
    return _col(value).contains(needle)


def scrub_newlines(value: ColumnOrName) -> Column:
    """T5 — replace \\n and \\r with spaces (py:290-291)."""
    return F.translate(_col(value), "\n\r", "  ")


#: string.punctuation — the exact char set py:302 filters
_PUNCT = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def strip_punct(value: ColumnOrName) -> Column:
    """T8 — remove punctuation (py:302 filter against string.punctuation).
    ``translate`` is a single char-map pass — no regex engine in the
    per-document hot path."""
    return F.translate(_col(value), _PUNCT, "")


def strip_digits(value: ColumnOrName) -> Column:
    """T9 — remove digit runs (py:304 ``re.sub('[0-9]+','')``); dropping
    each digit char via ``translate`` yields the identical string."""
    return F.translate(_col(value), "0123456789", "")


def tokenize(value: ColumnOrName) -> Column:
    """T10 — split on non-word runs (py:305 ``re.split('\\W+')``), dropping
    empty tokens (leading/trailing separators produce '' in both engines)."""
    toks = F.split(_col(value), r"\W+")
    return F.filter(toks, lambda w: w != F.lit(""))


_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def alpha_only(tokens: Column) -> Column:
    """T11 — keep purely alphabetic tokens (py:306-307 ``isalpha``):
    a token is [a-zA-Z]+ iff it is non-empty and stripping the alphabet
    leaves nothing — one ``translate`` char-map per token, no regex."""
    return F.filter(
        tokens, lambda w: (w != F.lit("")) & (F.translate(w, _ALPHABET, "") == F.lit(""))
    )


#: compact english stopword subset used by the SQL-expressible pipeline;
#: MLlib's StopWordsRemover (full 181-word list) is used in ml.features.
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "he", "in", "is", "it", "its", "of", "on", "that", "the", "to", "was",
    "were", "will", "with", "she", "her", "his", "this", "but", "not", "or",
)


def drop_stopwords(tokens: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """T12 — stop-word removal as an array filter (py:296,309)."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.filter(tokens, lambda w: ~F.array_contains(arr, w))


def lemmatize_rules(tokens: Column) -> Column:
    """T13 — deterministic rule-based lemmatizer over a token array.

    The reference uses NLTK WordNetLemmatizer (py:298,309); WordNet isn't
    a public dependency of this engine, so the DEFINED engine semantics
    are WordNet's own two-stage scheme with vendored data, all JVM-side:

    1. the irregular-noun exception table
       (:mod:`.irregular_nouns` — geese/analyses/heroes/diagnosis...)
       looked up first, exactly like WordNet's noun.exc;
    2. else the ordered suffix chain ``NOUN_SUFFIX_RULES`` (same
       module) — detachment rules plus the -is/-us/-ss identity
       classes standing in for WordNet's dictionary-membership test.
       Both this compiler and the DuckDB oracle (qdefs_text) read the
       one spec, so cross-engine parity is structural.

    Residue vs full WordNet is MEASURED, not guessed:
    ``tools/lemma_residue.py`` (numbers in COVERAGE.md).
    ``lemmatize_udf`` below upgrades to full WordNet when NLTK is
    available.
    """
    from .irregular_nouns import NOUN_EXCEPTIONS, NOUN_SUFFIX_RULES

    exc = F.create_map(
        *[F.lit(x) for kv in NOUN_EXCEPTIONS.items() for x in kv]
    )
    exc_keys = list(NOUN_EXCEPTIONS)

    def lemma(w: Column) -> Column:
        # the structured spec compiles to endswith/substr/translate —
        # plain string ops, ~an order of magnitude cheaper per token than
        # the regex chain they replace (measured on the t13 bench row)
        ruled = None
        for suffixes, min_len, strip_n, append, lower_alpha in NOUN_SUFFIX_RULES:
            cond = w.endswith(F.lit(suffixes[0]))
            for s in suffixes[1:]:
                cond = cond | w.endswith(F.lit(s))
            if min_len:
                cond = (F.length(w) >= min_len) & cond
            if lower_alpha:
                # [a-z]+ membership without a regex: stripping the
                # alphabet must leave nothing
                cond = cond & (
                    F.translate(w, "abcdefghijklmnopqrstuvwxyz", "") == ""
                )
            if strip_n == 0:
                val = w
            else:
                val = w.substr(F.lit(1), F.length(w) - strip_n)
                if append:
                    val = F.concat(val, F.lit(append))
            ruled = F.when(cond, val) if ruled is None else ruled.when(cond, val)
        ruled = ruled.otherwise(w)
        # isin compiles to an InSet hash probe — cheap on every token; the
        # map literal is only evaluated on the (rare) exception hits
        return F.when(w.isin(exc_keys), F.element_at(exc, w)).otherwise(ruled)

    return F.transform(tokens, lemma)


def lemmatize_verb_rules(tokens: Column) -> Column:
    """VERB-mode lemmatizer over a token array (beyond-reference: the
    reference's ``wn.lemmatize(word)`` runs at NLTK's default pos='n', so
    T13/:func:`lemmatize_rules` keeps noun-only parity — this operator
    adds the verb morphology clinical text is dense with).

    WordNet-shaped two-stage scheme, all JVM-side, no dictionary:

    1. the vendored verb.exc subset (:mod:`.irregular_verbs` —
       was/went/given/admitted/occurred...) looked up first;
    2. a PROTECTED list (morning/proceed/nothing...) standing in for the
       dictionary-membership test morphy applies;
    3. deterministic suffix detachment: ied→y (long) / strip-d (short),
       ies→y (long), (ss|ch|sh|x|zz|o)es→-es, es→-s, s→-s,
       -ed with letter-class e-restore (``ED_RESTORE_RE``: strip only the
       d so "danced"→dance), plain -ed, -ing with e-append
       (``ING_RESTORE_RE``), plain -ing — each length-guarded.

    The DuckDB oracle (qdefs_text ``t18``) compiles the identical chain
    from the same module constants.
    """
    from .irregular_verbs import (
        ED_RESTORE_RE,
        ING_RESTORE_RE,
        PROTECTED,
        S_STRIP_EXCLUDE_RE,
        VERB_EXCEPTIONS,
    )

    exc = F.create_map(
        *[F.lit(x) for kv in VERB_EXCEPTIONS.items() for x in kv]
    )
    exc_keys = list(VERB_EXCEPTIONS)

    def lemma(w: Column) -> Column:
        n = F.length(w)
        strip = lambda k: w.substr(F.lit(1), n - k)  # noqa: E731
        ruled = (
            F.when(w.isin(*PROTECTED), w)
            .when((n >= 6) & w.rlike("ied$"), F.regexp_replace(w, "ied$", "y"))
            .when(w.rlike("ied$"), strip(1))                    # died -> die
            .when((n >= 5) & w.rlike("ies$"), F.regexp_replace(w, "ies$", "y"))
            .when(w.rlike("(ss|ch|sh|x|zz|o)es$"), strip(2))    # watches -> watch
            .when((n >= 4) & w.rlike("es$"), strip(1))          # gives -> give
            .when(
                (n >= 4) & w.rlike("[a-z]s$") & ~w.rlike(S_STRIP_EXCLUDE_RE),
                strip(1),                                       # runs -> run
            )
            .when((n >= 5) & w.rlike(ED_RESTORE_RE), strip(1))  # danced -> dance
            .when((n >= 5) & w.rlike("ed$"), strip(2))          # walked -> walk
            .when(
                (n >= 6) & w.rlike(ING_RESTORE_RE),
                F.concat(strip(3), F.lit("e")),                 # dancing -> dance
            )
            .when((n >= 5) & w.rlike("ing$"), strip(3))         # walking -> walk
            .otherwise(w)
        )
        return F.when(w.isin(exc_keys), F.element_at(exc, w)).otherwise(ruled)

    return F.transform(tokens, lemma)


def clean_text_tokens(value: ColumnOrName) -> Column:
    """The full ``clean_textmain`` analyzer (py:300-310) as ONE column
    expression: T7 lower -> T8 punct -> T9 digits -> T10 tokenize ->
    T11 alpha -> T12 stopwords -> T13 lemmatize."""
    x = F.lower(_col(value))
    x = strip_punct(x)
    x = strip_digits(x)
    toks = tokenize(x)
    toks = alpha_only(toks)
    toks = drop_stopwords(toks)
    return lemmatize_rules(toks)


def lemmatize_udf():
    """Optional WordNet-backed lemmatizer (pandas_udf over token arrays),
    gated on NLTK being importable with the wordnet corpus present.
    Returns None when unavailable — callers fall back to
    :func:`lemmatize_rules`. The dictionary loads once per executor
    process (module-level import inside the UDF)."""
    try:
        import nltk  # noqa: F401
        from nltk.stem import WordNetLemmatizer

        WordNetLemmatizer().lemmatize("tests")  # force corpus load / fail fast
    except Exception:
        return None

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _lemmatize(batch: pd.Series) -> pd.Series:
        from nltk.stem import WordNetLemmatizer

        wnl = WordNetLemmatizer()
        return batch.map(lambda toks: [wnl.lemmatize(t) for t in (toks or [])])

    return _lemmatize
