"""Irregular English noun forms for the T13 lemmatizer.

The reference lemmatizes with NLTK's WordNetLemmatizer
(Hap880_Final_Project.py:298,309), whose noun lookup consults WordNet's
exception list (noun.exc, the classic irregular-plural table) before the
suffix-detachment rules. NLTK/WordNet aren't dependencies of this engine,
so this module vendors the high-frequency subset of that table as plain
data: irregular plurals (geese/mice/children), latinate plurals
(analyses/criteria/indices), -ves and -oes plurals, -men compounds, and
singular nouns the bare ``*s -> *`` rule would mangle (diagnosis, virus,
series). Both the Spark lemmatizer (functions/text.py) and the DuckDB
oracle SQL (qdefs_text.py) are generated from THIS dict — one source of
truth, exact cross-engine parity.

WordNet is public, permissively licensed (Princeton WordNet license);
this is a curated common-form subset, not a copy of the full database.
Forms where WordNet's shortest-lemma tie-break is ambiguous (axes, data,
media, dice) are deliberately omitted — the suffix rules handle them and
COVERAGE.md documents the residue.
"""

from __future__ import annotations

NOUN_EXCEPTIONS: dict[str, str] = {
    # classic irregular plurals
    "men": "man",
    "women": "woman",
    "children": "child",
    "brethren": "brother",
    "teeth": "tooth",
    "feet": "foot",
    "geese": "goose",
    "mice": "mouse",
    "lice": "louse",
    "oxen": "ox",
    # -ves plurals
    "knives": "knife",
    "wives": "wife",
    "lives": "life",
    "leaves": "leaf",
    "loaves": "loaf",
    "halves": "half",
    "selves": "self",
    "shelves": "shelf",
    "thieves": "thief",
    "wolves": "wolf",
    "calves": "calf",
    "elves": "elf",
    "scarves": "scarf",
    "hooves": "hoof",
    "sheaves": "sheaf",
    # -oes plurals (the bare rule would leave a trailing 'e')
    "heroes": "hero",
    "potatoes": "potato",
    "tomatoes": "tomato",
    "echoes": "echo",
    "torpedoes": "torpedo",
    "vetoes": "veto",
    "volcanoes": "volcano",
    "mosquitoes": "mosquito",
    # latinate -es -> -is
    "analyses": "analysis",
    "bases": "basis",
    "crises": "crisis",
    "theses": "thesis",
    "hypotheses": "hypothesis",
    "parentheses": "parenthesis",
    "syntheses": "synthesis",
    "oases": "oasis",
    "diagnoses": "diagnosis",
    "prognoses": "prognosis",
    "neuroses": "neurosis",
    "psychoses": "psychosis",
    "metamorphoses": "metamorphosis",
    "emphases": "emphasis",
    # latinate -ices -> -ix/-ex
    "matrices": "matrix",
    "indices": "index",
    "appendices": "appendix",
    "vertices": "vertex",
    "vortices": "vortex",
    "apices": "apex",
    "codices": "codex",
    # latinate -i -> -us
    "radii": "radius",
    "foci": "focus",
    "fungi": "fungus",
    "nuclei": "nucleus",
    "stimuli": "stimulus",
    "alumni": "alumnus",
    "cacti": "cactus",
    "syllabi": "syllabus",
    "termini": "terminus",
    # latinate -a -> -on/-um
    "genera": "genus",
    "corpora": "corpus",
    "phenomena": "phenomenon",
    "criteria": "criterion",
    "curricula": "curriculum",
    "memoranda": "memorandum",
    "millennia": "millennium",
    "spectra": "spectrum",
    "bacteria": "bacterium",
    "strata": "stratum",
    "addenda": "addendum",
    "errata": "erratum",
    "ova": "ovum",
    # -men compounds
    "firemen": "fireman",
    "policemen": "policeman",
    "gentlemen": "gentleman",
    "businessmen": "businessman",
    "chairmen": "chairman",
    "freshmen": "freshman",
    "spokesmen": "spokesman",
    "salesmen": "salesman",
    "craftsmen": "craftsman",
    "fishermen": "fisherman",
    "congressmen": "congressman",
    "statesmen": "statesman",
    "workmen": "workman",
    "gunmen": "gunman",
    # singulars the bare '*s -> *' rule would mangle (WordNet keeps them)
    "diagnosis": "diagnosis",
    "analysis": "analysis",
    "basis": "basis",
    "crisis": "crisis",
    "thesis": "thesis",
    "hypothesis": "hypothesis",
    "emphasis": "emphasis",
    "synthesis": "synthesis",
    "parenthesis": "parenthesis",
    "pelvis": "pelvis",
    "iris": "iris",
    "tennis": "tennis",
    "virus": "virus",
    "census": "census",
    "status": "status",
    "bonus": "bonus",
    "focus": "focus",
    "campus": "campus",
    "corpus": "corpus",
    "genus": "genus",
    "apparatus": "apparatus",
    "consensus": "consensus",
    "surplus": "surplus",
    "chaos": "chaos",
    "cosmos": "cosmos",
    "ethos": "ethos",
    "pathos": "pathos",
    "lens": "lens",
    "canvas": "canvas",
    "atlas": "atlas",
    "alias": "alias",
    "bias": "bias",
    "news": "news",
    "series": "series",
    "species": "species",
    "physics": "physics",
    "mathematics": "mathematics",
    "economics": "economics",
    "statistics": "statistics",
    "ethics": "ethics",
    "politics": "politics",
    # s-final forms WordNet keeps whole that no safe pattern covers
    # (plural-only nouns, lexicalized adverbs, possessive pronouns,
    # disease names ending -es) — round 6, driven by the measured
    # probe-lexicon divergence in tools/lemma_residue.py
    "asbestos": "asbestos",
    "pancreas": "pancreas",
    "diabetes": "diabetes",
    "herpes": "herpes",
    "rabies": "rabies",
    "scabies": "scabies",
    "measles": "measles",
    "mumps": "mumps",
    "always": "always",
    "perhaps": "perhaps",
    "whereas": "whereas",
    "besides": "besides",
    "sometimes": "sometimes",
    "towards": "towards",
    "upstairs": "upstairs",
    "downstairs": "downstairs",
    "overseas": "overseas",
    "indoors": "indoors",
    "outdoors": "outdoors",
    "hers": "hers",
    "ours": "ours",
    "yours": "yours",
    "theirs": "theirs",
    # -ie plurals the ies->y detachment would mangle (WordNet's
    # dictionary check rescues movie/calorie; vendored here)
    "movies": "movie",
    "calories": "calorie",
    # -us nouns' -uses plurals: no regex separates these from
    # consonant+use stems (abuses/excuses/fuses), only a dictionary —
    # so the frequent ones are vendored and the plain s-strip keeps
    # the -use class correct
    "buses": "bus",
    "gases": "gas",
    "lenses": "lens",
    "viruses": "virus",
    "statuses": "status",
    "bonuses": "bonus",
    "campuses": "campus",
    "sinuses": "sinus",
    "censuses": "census",
    "fetuses": "fetus",
    "walruses": "walrus",
    "circuses": "circus",
    "choruses": "chorus",
    "octopuses": "octopus",
    # -i stems' -is plurals: the "keep -is" identity rule (WordNet's
    # axis/sepsis/-itis/-osis class) would swallow these
    "skis": "ski",
    "taxis": "taxi",
    "alibis": "alibi",
    "safaris": "safari",
    "bikinis": "bikini",
    "martinis": "martini",
    # -u stems' -us plurals: same story vs the "keep -us" identity rule
    "menus": "menu",
    "gurus": "guru",
    "emus": "emu",
    "tutus": "tutu",
}

#: Ordered suffix-detachment chain shared by the Spark lemmatizer
#: (functions/text.py compiles it to a WHEN chain) and the generated
#: DuckDB oracle (qdefs_text.py compiles the same spec to CASE SQL) —
#: one source of truth, exact cross-engine parity. Each entry is
#: ``(match_regex, min_len, sub_regex, replacement)``; ``sub_regex``
#: None means the word is kept unchanged (an identity class standing in
#: for WordNet's dictionary-membership test: -is and -us finals are
#: singular in English except for the vendored -i/-u plural stems
#: above). First matching rule wins; exceptions are consulted before
#: any rule.
#: Ordered suffix-detachment chain, STRUCTURED so both compilers emit
#: cheap string ops instead of per-token regexes (an 8-regex chain per
#: token measurably dominated the t13/t14/t16 rows):
#:   (suffixes, min_len, strip_n, append, require_lower_alpha)
#: semantics: if len(w) >= min_len and w ends with any of ``suffixes``
#: (and, when flagged, w is entirely [a-z]), emit w[:-strip_n] + append.
#: strip_n == 0 means the identity class (word kept whole).
NOUN_SUFFIX_RULES: list[tuple[tuple[str, ...], int, int, str, bool]] = [
    (("sses",), 0, 2, "", False),            # glasses -> glass
    (("ches", "shes", "xes"), 0, 2, "", False),  # churches/dishes/boxes
    (("ies",), 5, 3, "y", False),            # studies -> study
    (("ies",), 0, 1, "", False),             # pies/ties/lies/dies -> -ie
    (("is",), 0, 0, "", False),              # axis/sepsis/-itis/-osis kept
    (("us",), 0, 0, "", False),              # virus/campus/mucus kept
    (("ss",), 0, 0, "", False),              # dress kept
    (("s",), 4, 1, "", True),                # cats -> cat (length-guarded)
]
