"""Low-level string helpers shared by the transform library.

The accent-fold table reproduces the reference's hand-rolled
``strip_accent`` exactly (reference:
crates/libs/lib-etl/src/transforms/utils.rs:13-68): it folds only the
listed Latin-1 vowels + c-cedilla + n-tilde and deliberately does NOT
fold ``ø``, ``ß``, ``œ``, ``ÿ`` or anything else (golden:
``Brøgger → BRØGGER``, ``Straße → STRAßE``). Do not replace this with
NFKD/unidecode — the table IS the spec.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fold groups: (lowercase members, lower target, uppercase members, upper target)
_FOLDS = [
    ("àáâãäå", "a", "ÀÁÂÃÄÅ", "A"),
    ("èéêë", "e", "ÈÉÊË", "E"),
    ("ìíîï", "i", "ÌÍÎÏ", "I"),
    ("òóôõö", "o", "ÒÓÔÕÖ", "O"),
    ("ùúûü", "u", "ÙÚÛÜ", "U"),
    ("ç", "c", "Ç", "C"),
    ("ñ", "n", "Ñ", "N"),
]

ACCENT_SRC = "".join(lo + up for lo, _, up, _ in _FOLDS)
ACCENT_DST = "".join(lt * len(lo) + ut * len(up) for lo, lt, up, ut in _FOLDS)

_ACCENT_TABLE = str.maketrans(ACCENT_SRC, ACCENT_DST)


def strip_accent_py(text: str) -> str:
    """Pure-Python flavor (used inside pandas UDFs and the oracle)."""
    return text.translate(_ACCENT_TABLE)


def strip_accent(col: Column) -> Column:
    """Native flavor — one JVM-side translate, stays in codegen."""
    return F.translate(col, ACCENT_SRC, ACCENT_DST)


def regexp_replace_first(col: Column, pattern: str, replacement: str) -> Column:
    """Replace only the FIRST (leftmost) occurrence of ``pattern``.

    Polars ``str.replace`` is first-occurrence-only and the reference
    leans on that (e.g. the nom delimiter and code_naf cleanup —
    crates/libs/lib-etl/src/transforms/nom.rs:105-106,
    code_naf.rs:12-29). Spark's ``regexp_replace`` is replace-all, so we
    anchor a lazy prefix: the ``^(?s)(.*?)pat`` pattern can match at most
    once and the non-greedy prefix pins it to the leftmost occurrence.

    ``pattern`` must not contain capturing groups (use ``(?:...)``) and
    ``replacement`` must not start with a digit (it follows ``$1``).
    """
    escaped = replacement.replace("\\", "\\\\").replace("$", "\\$")
    return F.regexp_replace(col, f"(?s)^(.*?)(?:{pattern})", f"$1{escaped}")


# Civilite vocabulary — reference: crates/libs/lib-etl/src/config.rs:67-97.
# SPECIAL_CIVILITIES is compared against the accent-STRIPPED uppercased
# input, so the accented entries ("GÉNÉRAL", "PRÉFET") can only match
# inputs whose accents survive strip_accent (É is folded to E, so in
# practice they never match — preserved verbatim for parity).
SPECIAL_CIVILITIES = frozenset(
    [
        "DOCTEUR",
        "GÉNÉRAL",
        "COMPTE",
        "INGÉNIEUR GÉNÉRAL",
        "PRÉFET",
        "PROFESSEUR",
        "MONSEIGNEUR",
        "SŒUR",
        "COMMISSAIRE",
    ]
)

CIVILITE_MAP = {
    "MONSIEUR": "MONSIEUR",
    "M": "MONSIEUR",
    "M.": "MONSIEUR",
    "MR": "MONSIEUR",
    "MM": "MONSIEUR",
    "M(ESPACE)": "MONSIEUR",
    "MADAME": "MADAME",
    "MME": "MADAME",
    "MRS": "MADAME",
    "MS": "MADAME",
    "MLLE": "MADAME",
    "MAD": "MADAME",
    "MADEMOISELLE": "MADAME",
}
