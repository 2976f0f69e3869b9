"""The 13 per-column normalization transforms (T1-T13 in SURVEY.md §2.10).

Each transform exists in up to two flavors, mirroring the reference:

- ``*_expr(col)`` — native Column expressions (Catalyst-optimizable,
  whole-stage codegen; the analogue of the reference's
  ``col_*_with_polars_expr`` functions).
- ``*_py(value)`` + ``*_udf(col)`` — a scalar Python function wrapped in
  an Arrow-batched pandas UDF (the analogue of the reference's
  ``transform_string_series`` UDF flavor,
  crates/libs/lib-etl/src/transforms/utils.rs:70-77).

The two flavors differ subtly on purpose (the reference's do too — e.g.
the expr flavor of ``nom`` replaces only the FIRST delimiter while the
UDF flavor replaces all, crates/libs/lib-etl/src/transforms/nom.rs).
The composition actually used by the JDD/HDD pipelines (expr flavor for
11 transforms, UDF flavor for civilite + telephone) is exposed by
``jdd_normalize_exprs`` / ``hdd_normalize_exprs``.

Python scalar functions double as the pure-pandas test oracle.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from etl_rs_spark.functions.strings import (
    CIVILITE_MAP,
    SPECIAL_CIVILITIES,
    regexp_replace_first,
    strip_accent,
    strip_accent_py,
)

# ---------------------------------------------------------------------------
# plumbing


def string_udf(fn: Callable[[str | None], str | None]) -> Callable[[Column], Column]:
    """Wrap an Option<&str> -> Option<String> scalar fn as a pandas UDF."""

    def _series(s: pd.Series) -> pd.Series:
        return s.map(lambda v: fn(v) if isinstance(v, str) else None)

    udf = F.pandas_udf(_series, StringType())

    def apply(col: Column) -> Column:
        return udf(col)

    apply.fn = fn  # type: ignore[attr-defined]
    return apply


# ---------------------------------------------------------------------------
# T1 nom — reference: crates/libs/lib-etl/src/transforms/nom.rs

_NOM_EDGE = r"^[^a-zA-ZÀ-ÿ\s]+|[^a-zA-ZÀ-ÿ\s]+$"
_NOM_DELIM = r"//|_|/|&"
_NOM_INVALID = r"[^a-zA-Z0-9À-ÿ\s\-'’]"


def nom_expr(col: Column) -> Column:
    """Expr flavor (nom.rs:83-114): first-only delimiter replace, no
    final trim (golden keeps the trailing space of 'SEBASTIEN ET PASCAL ').

    Every ``\\s`` goes through Java's ``(?U)`` flag: the reference is
    Rust regex, whose ``\\s`` is UNICODE whitespace (NBSP, U+2028, ...)
    — as is Python re's in the ``_nom_expr_py`` twin — while Java's
    default ``\\s`` is ASCII-only. Without the flag an NBSP between
    names is silently DELETED by the invalid-char strip instead of
    collapsing to a space (found by flavor-parity fuzzing)."""
    c = F.regexp_replace(col, r"(?U)^\s+|\s+$", "")
    c = F.upper(strip_accent(c))
    c = F.regexp_replace(c, "(?U)" + _NOM_EDGE, "")
    c = regexp_replace_first(c, _NOM_DELIM, " ET ")
    c = F.regexp_replace(c, "(?U)" + _NOM_INVALID, "")
    c = F.regexp_replace(c, r"\-+", " ")
    c = F.regexp_replace(c, r"(?U)\s+", " ")
    return c


def nom_py(text: str | None) -> str | None:
    """UDF flavor (nom.rs:15-77): all delimiters replaced, space-padded,
    empty/whitespace input maps to null."""
    if text is None:
        return None
    text = text.strip()
    if not text:
        return None
    text = strip_accent_py(text).upper()
    text = re.sub(_NOM_EDGE, "", text)

    # replace_delimiters_inside_text (nom.rs:16-54): pad with spaces
    # unless already space-surrounded, then collapse + trim
    out, last = [], 0
    for m in re.finditer(_NOM_DELIM, text):
        before = m.start() > 0 and text[m.start() - 1].isspace()
        after = m.end() < len(text) and text[m.end()].isspace()
        out.append(text[last : m.start()])
        out.append("ET" if (before and after) else " ET ")
        last = m.end()
    out.append(text[last:])
    text = re.sub(r"\s+", " ", "".join(out)).strip()

    text = re.sub(_NOM_INVALID, "", text)
    text = re.sub(r"\-+", " ", text)
    text = re.sub(r"\s+", " ", text)
    return text


nom_udf = string_udf(nom_py)


# ---------------------------------------------------------------------------
# T2 prenom — reference: crates/libs/lib-etl/src/transforms/prenom.rs

_PRENOM_SPECIAL = r"[^À-ÿa-zA-Z\s\-'’&]"


def _prenom_format_part(part: str) -> str:
    """Title-case a '-'-separated part: first char uppercased THEN
    accent-stripped (élie→Elie, amélie→Amélie), rest lowercased."""
    subs = []
    for sub in part.split():
        first = strip_accent_py(sub[0].upper())
        subs.append(first + sub[1:].lower())
    return " ".join(subs)


def _prenom_core(text: str) -> str:
    text = re.sub(_PRENOM_SPECIAL, "", text)
    text = re.sub(r"&+", " ", text)
    text = re.sub(r"\s+", " ", text.strip())
    return text


def prenom_py(text: str | None) -> str | None:
    """UDF flavor (prenom.rs:12-82): byte-length-1 inputs keep case;
    1-char '-'-parts kept as-is."""
    if text is None:
        return None
    if len(text.encode("utf-8")) == 1:
        kept = re.sub(r"[^a-zA-ZÀ-ÿ]", "", text)
        return kept or None
    text = _prenom_core(text)
    parts = [
        p.strip() if len(p.strip().encode("utf-8")) == 1 else _prenom_format_part(p)
        for p in text.split("-")
    ]
    return "-".join(parts)


def prenom_expr_py(text: str | None) -> str | None:
    """Expr flavor (prenom.rs:88-144): no length-1 special cases —
    every part is title-cased."""
    if text is None:
        return None
    text = text.strip()  # the expr chain trims before the map
    text = _prenom_core(text)
    return "-".join(_prenom_format_part(p) for p in text.split("-"))


prenom_udf = string_udf(prenom_py)
prenom_expr = string_udf(prenom_expr_py)  # branchy: stays a pandas UDF


# ---------------------------------------------------------------------------
# T3 civilite — reference: crates/libs/lib-etl/src/transforms/civilite.rs
# (UDF flavor only; the pipelines apply it via col_with_udf_expr)


def civilite_py(text: str | None) -> str | None:
    if text is None:
        return None
    text = strip_accent_py(text.strip()).upper()
    if text in SPECIAL_CIVILITIES:
        return None
    text = re.sub(r"[.,/&\\]", " ", text)
    titles: list[str] = []
    for part in text.split():
        mapped = CIVILITE_MAP.get(part)
        if mapped and mapped not in titles:
            titles.append(mapped)
    result = [t for t in ("MONSIEUR", "MADAME") if t in titles]
    return " ".join(result) if result else None


civilite_udf = string_udf(civilite_py)


# ---------------------------------------------------------------------------
# T4 email — reference: crates/libs/lib-etl/src/transforms/email.rs

# end-of-TEXT anchored (\z Java / \Z Python), not '$': both engines'
# '$' also matches before a trailing newline, so 'A@B.FR\n' would
# validate and the newline survive into the "normalized" value — the
# Rust reference regex ('$' = end of haystack) rejects it.
_EMAIL_RE_SQL = "^[A-Z0-9._%+-]+@[A-Z0-9.-]+\\.[A-Z]{2,}\\z"
_EMAIL_RE_PY = r"^[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,}\Z"


def email_expr(col: Column) -> Column:
    """Expr flavor (email.rs:65-125): upper → first-only strip of
    ['’&\\s]+ → first-only '@.'→'@' → accent fold → validate → drop
    domain hyphens. Fully native (no Python in the hot path)."""
    c = F.upper(col)
    c = regexp_replace_first(c, r"(?U)['’&\s]+", "")
    c = regexp_replace_first(c, r"@\.", "@")
    c = strip_accent(c)

    local = F.substring_index(c, "@", 1)
    domain = F.substring_index(c, "@", -1)
    labels = F.split(domain, r"\.")
    # try_element_at: ANSI-safe (null, not error, when the domain has a
    # single label and -2 is out of bounds)
    ext_len = F.length(F.try_element_at(labels, F.lit(-1)))
    valid = (
        c.rlike(_EMAIL_RE_SQL)
        & (F.length(F.try_element_at(labels, F.lit(-2))) >= 2)
        & (ext_len >= 2)
        & (ext_len <= 4)
    )
    return F.when(valid, F.concat(local, F.lit("@"), F.translate(domain, "-", "")))


def email_py(email: str | None) -> str | None:
    """UDF flavor (email.rs:13-59): removes ALL spaces/quotes/ampersands
    and ALL '@.' occurrences (vs first-only in the expr flavor)."""
    if email is None:
        return None
    email = email.replace(" ", "").upper()
    email = strip_accent_py(email)
    for ch in ("'", "’", "&"):
        email = email.replace(ch, "")
    email = email.replace("@.", "@")
    if not re.match(_EMAIL_RE_PY, email):
        return None
    parts = email.split("@")
    if len(parts) != 2:
        return None
    domain_parts = parts[1].split(".")
    if len(domain_parts) < 2:
        return None
    if len(domain_parts[-2]) < 2:
        return None
    if not (2 <= len(domain_parts[-1]) <= 4):
        return None
    return f"{parts[0]}@{parts[1].replace('-', '')}"


email_udf = string_udf(email_py)


def email_expr_py(email: str | None) -> str | None:
    """Pure-Python oracle of the EXPR flavor (for parity tests)."""
    if email is None:
        return None
    email = email.upper()
    email = re.sub(r"(?s)^(.*?)(?:['’&\s]+)", r"\1", email)
    email = re.sub(r"(?s)^(.*?)(?:@\.)", r"\1@", email)
    email = strip_accent_py(email)
    if not re.match(_EMAIL_RE_PY, email):
        return None
    local, domain = email.split("@", 1)
    labels = domain.split(".")
    if len(labels) < 2 or len(labels[-2]) < 2 or not (2 <= len(labels[-1]) <= 4):
        return None
    return f"{local}@{domain.replace('-', '')}"


# ---------------------------------------------------------------------------
# T5 telephone — reference: crates/libs/lib-etl/src/transforms/telephone.rs
# (UDF flavor only)

_PAID_PREFIXES = ("81", "82", "83", "87", "89")


def telephone_py(number: str | None) -> str | None:
    if number is None:
        return None
    n = "".join(ch for ch in number.strip() if ch.isascii() and ch.isdigit())

    def paid(s: str) -> bool:
        return s.startswith(_PAID_PREFIXES)

    def fmt(cc: str, rest: str) -> str:
        return f"+{cc} {rest[0]} {rest[1:3]} {rest[3:5]} {rest[5:7]} {rest[7:9]}"

    if len(n) == 10 and n.startswith("0") and not paid(n[1:]):
        return fmt("33", n[1:])
    if len(n) == 11 and n.startswith("33") and not paid(n[2:]):
        return fmt("33", n[2:])
    if len(n) == 12 and n.startswith("00"):
        # the reference's '00' international arm indexes past the string
        # end (telephone.rs:42-51 slices [11..13] of a 12-char string —
        # a panic); we define the case as null instead of crashing.
        return None
    if len(n) == 12 and n.startswith("330") and not paid(n[3:]):
        return fmt("33", n[3:])
    if len(n) == 9 and not paid(n):
        return fmt("33", n)
    return None


telephone_udf = string_udf(telephone_py)


# ---------------------------------------------------------------------------
# T6 raison_sociale — reference: crates/libs/lib-etl/src/transforms/raison_sociale.rs
# (both reference flavors share this exact logic)


def raison_sociale_py(text: str | None) -> str | None:
    if text is None:
        return None
    text = strip_accent_py(text)
    if len(text) >= 2 and text.startswith('"') and text.endswith('"'):
        text = text[1:-1]
    text = text.replace('""', '"')
    # uppercase char-by-char, but ß stays lowercase (Straße → STRAßE)
    return "".join(ch if ch == "ß" else ch.upper() for ch in text)


raison_sociale_udf = string_udf(raison_sociale_py)
raison_sociale_expr = raison_sociale_udf  # reference expr flavor is the same UDF


# ---------------------------------------------------------------------------
# T7 siret / T8 siren — reference: siret.rs / siren.rs


def siret_expr(col: Column) -> Column:
    cleaned = F.regexp_replace(col, "[^0-9]", "")
    return F.when(F.length(cleaned) == 14, cleaned)


def siret_py(text: str | None) -> str | None:
    if text is None:
        return None
    cleaned = "".join(ch for ch in text if ch.isdigit())
    return cleaned if len(cleaned) == 14 else None


def siren_expr(col: Column) -> Column:
    # (?U): unicode \s like the Rust reference / python twin — an NBSP
    # inside the digit groups must be stripped, not fail validation
    cleaned = F.regexp_replace(col, r"(?U)-|\s", "")
    return F.when(cleaned.rlike("^[0-9]{9}$"), cleaned)


def siren_py(text: str | None) -> str | None:
    if text is None:
        return None
    cleaned = re.sub(r"-|\s", "", text)
    return cleaned if re.match(r"^[0-9]{9}$", cleaned) else None


# ---------------------------------------------------------------------------
# T9 ape / T10 code_naf / T11 libelle_naf — reference: ape.rs / code_naf.rs /
# libelle_naf.rs. ape cleans ALL [.-_,]; code_naf/libelle_naf clean only the
# FIRST [.-_,;] occurrence (Polars str.replace).


def _naf_shape(cleaned: Column) -> Column:
    # \z (end of text), not '$': the cleaners here drop [.\-_,;] but a
    # trailing newline survives and Java's '$' would match before it
    digits = F.regexp_extract(cleaned, "^(\\d{4})[a-zA-Z]\\z", 1)
    letter = F.upper(F.regexp_extract(cleaned, "^\\d{4}([a-zA-Z])\\z", 1))
    return F.when(digits != "", F.concat(digits, letter))


def ape_expr(col: Column) -> Column:
    return _naf_shape(F.regexp_replace(col, r"[.\-_,]", ""))


def code_naf_expr(col: Column) -> Column:
    return _naf_shape(regexp_replace_first(col, r"[.\-_,;]", ""))


libelle_naf_expr = code_naf_expr  # identical logic, different column


def _naf_shape_py(cleaned: str) -> str | None:
    m = re.match(r"^(\d{4})([a-zA-Z])\Z", cleaned)
    return m.group(1) + m.group(2).upper() if m else None


def ape_py(text: str | None) -> str | None:
    if text is None:
        return None
    return _naf_shape_py(re.sub(r"[.\-_,]", "", text))


def code_naf_py(text: str | None) -> str | None:
    if text is None:
        return None
    return _naf_shape_py(re.sub(r"[.\-_,;]", "", text, count=1))


libelle_naf_py = code_naf_py


# ---------------------------------------------------------------------------
# T12 pce / T13 siret_successeur — reference: pce.rs / siret_successeur.rs
# (digits-only, no length check, empty string STAYS empty)


def pce_expr(col: Column) -> Column:
    # (?U): \D complements UNICODE digits, like the Rust reference and
    # the python twin's str.isdigit keep-set
    return F.regexp_replace(col, r"(?U)\D", "")


def pce_py(text: str | None) -> str | None:
    if text is None:
        return None
    return re.sub(r"\D", "", text)


siret_successeur_expr = pce_expr
siret_successeur_py = pce_py


# ---------------------------------------------------------------------------
# Pipeline compositions — exactly the flavor mix the reference examples use.


def jdd_normalize_exprs() -> dict[str, Column]:
    """examples/transform_jdd_normalisation.rs:40-52 — expr flavor for all
    but civilite + telephone (UDF flavor)."""
    return {
        "NOM": nom_expr(F.col("NOM")),
        "PRENOM": prenom_expr(F.col("PRENOM")),
        "CIVILITE": civilite_udf(F.col("CIVILITE")),
        "email": email_expr(F.col("email")),
        "TELEPHONE": telephone_udf(F.col("TELEPHONE")),
        "RAISON_SOCIALE": raison_sociale_expr(F.col("RAISON_SOCIALE")),
        "CODE_NAF": code_naf_expr(F.col("CODE_NAF")),
        "APE": ape_expr(F.col("APE")),
        "SIRET": siret_expr(F.col("SIRET")),
        "SIREN": siren_expr(F.col("SIREN")),
        "LIBELE_NAF": libelle_naf_expr(F.col("LIBELE_NAF")),
    }


def hdd_normalize_exprs() -> dict[str, Column]:
    """examples/transform_hdd_deduplication.rs:370-381."""
    return {
        "PCE": pce_expr(F.col("PCE")),
        "Nom": nom_expr(F.col("Nom")),
        "Prenom": prenom_expr(F.col("Prenom")),
        "Email": email_expr(F.col("Email")),
        "Telephone": telephone_udf(F.col("Telephone")),
        "Raison_sociale": raison_sociale_expr(F.col("Raison_sociale")),
        "SIRET": siret_expr(F.col("SIRET")),
        "SIRET successeur": siret_successeur_expr(F.col("SIRET successeur")),
    }


# Pure-python oracle mirrors of the pipeline compositions (see tests).
JDD_ORACLE_FNS: dict[str, Callable[[str | None], str | None]] = {
    "NOM": lambda v: _nom_expr_py(v),
    "PRENOM": prenom_expr_py,
    "CIVILITE": civilite_py,
    "email": email_expr_py,
    "TELEPHONE": telephone_py,
    "RAISON_SOCIALE": raison_sociale_py,
    "CODE_NAF": code_naf_py,
    "APE": ape_py,
    "SIRET": siret_py,
    "SIREN": siren_py,
    "LIBELE_NAF": libelle_naf_py,
}


def _nom_expr_py(text: str | None) -> str | None:
    """Pure-Python oracle of the nom EXPR flavor (first-only delimiter
    replace, no final trim)."""
    if text is None:
        return None
    text = re.sub(r"^\s+|\s+$", "", text)
    text = strip_accent_py(text).upper()
    text = re.sub(_NOM_EDGE, "", text)
    text = re.sub(r"(?s)^(.*?)(?:" + _NOM_DELIM + ")", r"\1 ET ", text, count=1)
    text = re.sub(_NOM_INVALID, "", text)
    text = re.sub(r"\-+", " ", text)
    text = re.sub(r"\s+", " ", text)
    return text


nom_expr_py = _nom_expr_py
