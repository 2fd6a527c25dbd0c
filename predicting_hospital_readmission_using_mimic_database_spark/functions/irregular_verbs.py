"""Irregular English verb forms for the verb-mode lemmatizer.

The reference lemmatizes tokens with NLTK's WordNetLemmatizer at the
DEFAULT pos='n' (Hap880_Final_Project.py:298,309) — so T13's noun-only
semantics is the faithful parity and is NOT changed by this module.
Discharge-style clinical text is verb-heavy ("admitted", "discharged",
"given"), so the engine additionally exposes a VERB-mode lemmatizer
(functions/text.py ``lemmatize_verb_rules``) built the same way WordNet's
morphy handles verbs: an exception table consulted first (verb.exc —
irregular pasts/participles and the doubled-consonant -ed/-ing forms
morphy's suffix rules cannot produce), then suffix detachment.

WordNet resolves rule ambiguity ("walked" -> walk vs "danced" -> dance)
by dictionary membership after each candidate detachment; a 150k-lemma
dictionary is not vendorable, so the engine's DEFINED semantics replace
the membership test with deterministic letter-class heuristics
(``ED_RESTORE_RE`` / ``ING_RESTORE_RE``: soft c/g, u/v/z, vowel+b stems
restore the final -e) plus ``PROTECTED``, a curated list of non-verb (or
base-form) tokens the bare rules would mangle (morning, proceed,
nothing...). Residue relative to full WordNet — rare stems outside the
letter classes ("rubbed" -> rubb) — is documented in COVERAGE.md §2.7.

WordNet is public, permissively licensed (Princeton WordNet license);
the exception entries below are the high-frequency subset of verb.exc
(same vendoring pattern as :mod:`.irregular_nouns`). Both the Spark
lemmatizer and the DuckDB oracle SQL (qdefs_text.py) are generated from
THIS module — one source of truth, exact cross-engine parity.
"""

from __future__ import annotations

#: after stripping -ed, stems ending in these classes get their -e back
#: ("danced" -> dance, "charged" -> charge, "continued" -> continue,
#: "saved" -> save, "seized" -> seize, "prescribed" -> prescribe);
#: implemented as strip-final-d so neither engine needs a backreference
ED_RESTORE_RE = r"(ced|ged|ued|ved|zed|[aeiou]bed)$"

#: same letter classes for -ing ("dancing" -> dance, "giving" -> give,
#: "describing" -> describe): strip "ing", append "e"
ING_RESTORE_RE = r"(cing|ging|uing|ving|zing|[aeiou]bing)$"

#: endings excluded from the bare ``s ->`` strip rule: -ss (glass), -us
#: (status/focus/thus), -is (this/diagnosis/basis), -as (pancreas/was) —
#: whole morphological classes WordNet's dictionary test would reject,
#: handled as a class instead of enumerating every member
S_STRIP_EXCLUDE_RE = r"(ss|us|is|as)$"

#: tokens the suffix rules must never touch: non-verbs ending in
#: -ing/-ed/-s and base-form verbs whose endings look inflected
PROTECTED: tuple[str, ...] = (
    # -ing non-verbs / base forms
    "thing", "something", "anything", "nothing", "everything",
    "morning", "evening", "ceiling", "during",
    "bring", "swing", "sting", "cling", "fling", "sling", "wring",
    "spring", "string",
    # -ed / -eed non-verbs and base forms
    "proceed", "succeed", "exceed", "speed", "breed", "bleed", "embed",
    "greed", "indeed", "hundred", "sacred", "wicked", "hatred", "kindred",
    # -s non-verbs the class exclusions (S_STRIP_EXCLUDE_RE) don't cover:
    # high-frequency function words, -es lookalikes, clinical nouns
    "news", "always", "perhaps", "lens", "species", "series", "herpes",
    "diabetes", "measles", "rabies", "scabies",
    # base forms ending in bare -s (also caught by the -us/-as class
    # exclusions; kept for documentation)
    "focus", "bias", "alias", "atlas", "canvas",
)

#: high-frequency subset of WordNet verb.exc: irregular pasts and
#: participles, plus doubled-consonant -ed/-ing forms (verb.exc carries
#: these precisely because the detachment rules cannot undouble)
VERB_EXCEPTIONS: dict[str, str] = {
    # be / have / do / go / say / see
    "is": "be", "am": "be", "are": "be", "was": "be",
    "were": "be", "been": "be", "being": "be",
    "has": "have", "had": "have",
    "did": "do", "done": "do",
    "went": "go", "gone": "go",
    "said": "say", "saw": "see", "seen": "see",
    # common irregular pasts / participles
    "made": "make", "took": "take", "taken": "take",
    "gave": "give", "given": "give",
    "got": "get", "gotten": "get",
    "came": "come", "became": "become",
    "ran": "run", "ate": "eat", "eaten": "eat",
    "felt": "feel", "found": "find", "kept": "keep", "left": "leave",
    "met": "meet", "sent": "send", "spent": "spend", "lost": "lose",
    "led": "lead", "held": "hold", "told": "tell",
    "thought": "think", "brought": "bring", "bought": "buy",
    "caught": "catch", "taught": "teach", "sought": "seek",
    "fought": "fight",
    "stood": "stand", "understood": "understand",
    "knew": "know", "known": "know", "grew": "grow", "grown": "grow",
    "drew": "draw", "drawn": "draw", "threw": "throw", "thrown": "throw",
    "flew": "fly", "flown": "fly",
    "wrote": "write", "written": "write",
    "rode": "ride", "ridden": "ride", "drove": "drive", "driven": "drive",
    "rose": "rise", "risen": "rise", "arose": "arise", "arisen": "arise",
    "chose": "choose", "chosen": "choose",
    "spoke": "speak", "spoken": "speak", "broke": "break", "broken": "break",
    "woke": "wake", "woken": "wake",
    "wore": "wear", "worn": "wear", "tore": "tear", "torn": "tear",
    "bore": "bear", "born": "bear", "borne": "bear",
    "sang": "sing", "sung": "sing", "began": "begin", "begun": "begin",
    "swam": "swim", "swum": "swim",
    "fell": "fall", "fallen": "fall", "sat": "sit",
    "lay": "lie", "lain": "lie", "laid": "lay", "paid": "pay",
    "heard": "hear", "meant": "mean", "built": "build", "dealt": "deal",
    "slept": "sleep", "bled": "bleed", "fed": "feed", "bred": "breed",
    "sped": "speed", "fled": "flee",
    "won": "win", "spun": "spin", "dug": "dig", "hung": "hang",
    "struck": "strike", "stuck": "stick", "swung": "swing",
    "lit": "light", "slid": "slide", "hid": "hide", "hidden": "hide",
    "bit": "bite", "bitten": "bite",
    "shook": "shake", "shaken": "shake",
    "froze": "freeze", "frozen": "freeze",
    "stole": "steal", "stolen": "steal",
    "forgot": "forget", "forgotten": "forget",
    "forgave": "forgive", "forgiven": "forgive",
    "underwent": "undergo", "undergone": "undergo",
    "withdrew": "withdraw", "withdrawn": "withdraw",
    # -eed pasts (no -eed rule exists: base verbs ending -eed outnumber
    # past forms, so the pasts are enumerated here instead)
    "freed": "free", "agreed": "agree", "guaranteed": "guarantee",
    "decreed": "decree",
    # short forms the length-guarded rules skip
    "used": "use", "owed": "owe", "dyed": "dye",
    # doubled-consonant -ed/-ing (verb.exc's largest family; clinically
    # frequent forms included)
    "admitted": "admit", "admitting": "admit",
    "readmitted": "readmit", "readmitting": "readmit",
    "transmitted": "transmit", "transmitting": "transmit",
    "omitted": "omit", "omitting": "omit",
    "submitted": "submit", "submitting": "submit",
    "permitted": "permit", "permitting": "permit",
    "committed": "commit", "committing": "commit",
    "occurred": "occur", "occurring": "occur",
    "referred": "refer", "referring": "refer",
    "transferred": "transfer", "transferring": "transfer",
    "preferred": "prefer", "preferring": "prefer",
    "deferred": "defer", "deferring": "defer",
    "planned": "plan", "planning": "plan",
    "scanned": "scan", "scanning": "scan",
    "stopped": "stop", "stopping": "stop",
    "dropped": "drop", "dropping": "drop",
    "wrapped": "wrap", "wrapping": "wrap",
    "clotted": "clot", "clotting": "clot",
    "controlled": "control", "controlling": "control",
    "cancelled": "cancel", "cancelling": "cancel",
    "labelled": "label", "labelling": "label",
    "swabbed": "swab", "swabbing": "swab",
    "running": "run", "cutting": "cut", "getting": "get",
    "putting": "put", "setting": "set", "sitting": "sit",
    "beginning": "begin", "swimming": "swim", "spinning": "spin",
    "winning": "win", "stirring": "stir",
    "tired": "tire",
}
