"""Text normalization / cleaning functions — Spark-first re-expression of
the reference's prep-stage scalar functions (SURVEY.md §2.8).

JVM-side column expressions wherever Spark builtins express the
semantics; Arrow-vectorized pandas UDFs only where they can't
(unicode NFC/NFKC, dateutil-style parsing).
"""

from __future__ import annotations

import html
import re
import unicodedata

import pandas as pd

from pyspark.sql import Column, functions as F, types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# clean_str — reference semantics: common/utils.py:276-293 (NFC normalize,
# strip zero-width & control chars, NBSP -> space, collapse whitespace)
# ---------------------------------------------------------------------------

_ZERO_WIDTH = re.compile(r"[​‌‍﻿]")
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_WS = re.compile(r"\s+")


def clean_str_py(s: str | None) -> str | None:
    if s is None:
        return None
    s = unicodedata.normalize("NFC", s)
    s = _ZERO_WIDTH.sub("", s)
    s = _CTRL.sub("", s)
    s = s.replace(" ", " ")
    return _WS.sub(" ", s).strip()


@pandas_udf(T.StringType())
def clean_str_udf(s: pd.Series) -> pd.Series:
    return s.map(clean_str_py, na_action="ignore")


# ---------------------------------------------------------------------------
# strip_html_light — reference semantics: common/utils.py:295-309
# ---------------------------------------------------------------------------

_TAG = re.compile(r"<[^>]+>")


def strip_html_py(s: str | None) -> str | None:
    if s is None:
        return None
    s = html.unescape(s)
    s = _TAG.sub(" ", s)
    return _WS.sub(" ", s).strip()


@pandas_udf(T.StringType())
def strip_html_udf(s: pd.Series) -> pd.Series:
    return s.map(strip_html_py, na_action="ignore")


# ---------------------------------------------------------------------------
# canonical_url — reference semantics: common/utils.py:59-84 (default scheme
# https, lowercase scheme+host, strip fragment)
# ---------------------------------------------------------------------------

def canonical_url_py(u: str | None) -> str | None:
    from urllib.parse import urlsplit, urlunsplit

    if u is None or not u.strip():
        return None
    u = u.strip()
    if "://" not in u:
        u = "https://" + u
    parts = urlsplit(u)
    return urlunsplit((
        parts.scheme.lower(), parts.netloc.lower(), parts.path, parts.query, ""
    ))


@pandas_udf(T.StringType())
def canonical_url_udf(s: pd.Series) -> pd.Series:
    return s.map(canonical_url_py, na_action="ignore")


# ---------------------------------------------------------------------------
# normalize_date_to_yyyy_mm_dd — reference: common/utils.py:143-209
# (ordinal-suffix strip, ISO first, then day-first fallback)
# ---------------------------------------------------------------------------

_ORDINAL = re.compile(r"(\d{1,2})(st|nd|rd|th)\b", re.IGNORECASE)


def normalize_date_py(s: str | None) -> str | None:
    if s is None or not s.strip():
        return None
    s = _ORDINAL.sub(r"\1", s.strip())
    from datetime import datetime

    iso_like = re.match(r"^(\d{4})-(\d{2})-(\d{2})", s)
    if iso_like:
        try:
            return datetime(int(iso_like.group(1)), int(iso_like.group(2)),
                            int(iso_like.group(3))).strftime("%Y-%m-%d")
        except ValueError:
            return None
    for fmt in ("%d/%m/%Y", "%d-%m-%Y", "%d %b %Y", "%d %B %Y", "%B %d %Y", "%b %d %Y", "%Y/%m/%d"):
        try:
            return datetime.strptime(s, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return None


@pandas_udf(T.StringType())
def normalize_date_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_date_py, na_action="ignore")


# ---------------------------------------------------------------------------
# JVM-side column helpers (pure Catalyst expressions — codegen'd)
# ---------------------------------------------------------------------------

def norm_ws(col: Column) -> Column:
    """Collapse whitespace + trim, JVM-side (the SQL-parity normalizer)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def is_blank(col: Column) -> Column:
    """Reference's blankness predicate (stages/downloader/utils.py:95-104)."""
    return col.isNull() | (F.trim(col) == "")


def tokens_col(col: Column) -> Column:
    """JVM-side 'simple' tokenizer: lowercase [a-z0-9_]+ runs. Matches
    functions.tokenize.tokenize_simple exactly (same character class)."""
    return F.regexp_extract_all(F.lower(col), F.lit("([a-z0-9_]+)"), 1)
