"""JVM-side Column implementations of the reference's scalar operators,
plus mechanically-generated ANSI-SQL (DuckDB) equivalents.

Two render targets, one source of truth:

* ``*_col(...)`` — pyspark Column expression chains (whole-stage codegen,
  no Python), mirroring address.py N1/N2 and the territory lookup chains
  (territory.py:212-293) as map-literal lookups;
* ``*_sql(...)`` — the same semantics rendered as SQL strings for the
  DuckDB oracle in ``__spark_entry__.py``; the CASE arms are generated
  from the SAME vendored refdata dicts, so Spark and oracle can only agree
  if the engine's behavior is right, not because code was pasted twice.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..refdata import (
    COUNTRIES,
    COUNTRY_ALIASES_OF,
    DEFAULT_SUBDIVISION,
    SUBDIVISIONS,
    SUBDIV_COUNTRY,
    SUBDIV_METADATA,
    SUPPORTED_TERRITORY_CODES,
    normalize_territory_code,
    territory_children_codes,
    territory_parents_codes,
)
from ..refdata.build import META_CITY
from ..refdata.territory_tables import FOREIGN_TERRITORIES_MAPPING

# ---------------------------------------------------------------------------
# N1 — postal-code canonicalization (address.py:326-335)
# ---------------------------------------------------------------------------


def postal_canon_col(col: Column) -> Column:
    out = F.upper(col)
    out = F.regexp_replace(out, r"[^A-Z0-9 -]", "")
    out = F.regexp_replace(out, r"[^A-Z0-9]*-+[^A-Z0-9]*", "-")
    out = F.regexp_replace(out, r"^-+|-+$", "")
    return out


def postal_canon_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace(upper("
        + expr
        + "), '[^A-Z0-9 -]', '', 'g'), '[^A-Z0-9]*-+[^A-Z0-9]*', '-', 'g'),"
        " '^-+|-+$', '', 'g')"
    )


# ---------------------------------------------------------------------------
# N2/N3 — whitespace collapse + blank-to-null (address.py:337-346)
# ---------------------------------------------------------------------------


def ws_norm_col(col: Column) -> Column:
    out = F.trim(F.regexp_replace(col, r"\s+", " "))
    return F.when(out == "", None).otherwise(out)


def ws_norm_sql(expr: str) -> str:
    return (
        "nullif(trim(regexp_replace(" + expr + ", '\\s+', ' ', 'g')), '')"
    )


# ---------------------------------------------------------------------------
# Territory lookup chains as data (one dict -> Column map + SQL CASE)
# ---------------------------------------------------------------------------


def _total_map(resolve_aliases: bool, resolve_top_country: bool) -> Dict[str, str]:
    """code -> fully-resolved code for every supported territory code."""
    return {
        code: normalize_territory_code(
            code,
            resolve_aliases=resolve_aliases,
            resolve_top_country=resolve_top_country,
        )
        for code in sorted(SUPPORTED_TERRITORY_CODES)
    }


NORMALIZE_NOALIAS: Dict[str, str] = _total_map(False, False)
NORMALIZE_ALIAS: Dict[str, str] = _total_map(True, False)
NORMALIZE_TOP: Dict[str, str] = _total_map(True, True)


# Above this size, literal-per-entry constructs stop scaling: on the Spark
# side F.create_map costs ~2N py4j round-trips to even BUILD (measured 4.3 s
# at 5.5k entries) and yields a 2N-child Catalyst expression; on the DuckDB
# side a generated CASE chain is interpreted arm-by-arm per row.  Large maps
# switch to single-literal encodings instead (same semantics, one constant).
_BIG_MAP_THRESHOLD = 200
_PAIR_SEP = "\x1e"  # ASCII record separator — never occurs in ISO refdata
_KV_SEP = "\x1f"  # ASCII unit separator


def map_lookup_col(table: Mapping[str, Optional[str]], key: Column) -> Column:
    """Literal-map lookup (JVM side); missing key -> NULL.

    Small maps: ``element_at(create_map(...), key)``.  Large maps: the whole
    table rides in ONE string literal through ``str_to_map`` — Catalyst
    constant-folds it to a single map literal, so lookup cost is identical
    but plan construction is O(1) py4j calls instead of O(N).
    """
    items = [(k, v) for k, v in table.items() if v is not None]
    if len(items) <= _BIG_MAP_THRESHOLD:
        pairs = []
        for k, v in items:
            pairs.extend([F.lit(k), F.lit(v)])
        return F.element_at(F.create_map(*pairs), key)
    joined = _PAIR_SEP.join(f"{k}{_KV_SEP}{v}" for k, v in items)
    if joined.count(_KV_SEP) != len(items) or joined.count(_PAIR_SEP) != len(items) - 1:
        raise ValueError("map keys/values contain reserved separator bytes")
    return F.element_at(
        F.str_to_map(F.lit(joined), F.lit(_PAIR_SEP), F.lit(_KV_SEP)), key
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def map_lookup_sql(table: Mapping[str, Optional[str]], expr: str) -> str:
    """Same lookup as generated SQL (DuckDB oracle side).

    Small maps render as a CASE chain (readable in the recorded oracle);
    large maps as constant-list indexing via ``list_position`` — missing or
    NULL keys index position NULL which yields NULL, exactly the CASE/ELSE
    NULL semantics (measured ~2.3x faster than a 5.5k-arm CASE).
    """
    items = [(k, v) for k, v in table.items() if v is not None]
    if len(items) <= _BIG_MAP_THRESHOLD:
        arms = "\n".join(f"WHEN {_sql_str(k)} THEN {_sql_str(v)}" for k, v in items)
        return f"(CASE {expr}\n{arms}\nELSE NULL END)"
    keys = ", ".join(_sql_str(k) for k, _ in items)
    vals = ", ".join(_sql_str(v) for _, v in items)
    return f"(([{vals}])[list_position([{keys}], {expr})])"


def territory_normalize_col(code: Column, mode: str = "noalias") -> Column:
    """strip/upper then total-map lookup; unknown -> NULL
    (territory.py:212-235 with errors-as-null, address.py:357-363)."""
    table = {
        "noalias": NORMALIZE_NOALIAS,
        "alias": NORMALIZE_ALIAS,
        "top": NORMALIZE_TOP,
    }[mode]
    return map_lookup_col(table, F.upper(F.trim(code)))


def territory_normalize_sql(expr: str, mode: str = "noalias") -> str:
    table = {
        "noalias": NORMALIZE_NOALIAS,
        "alias": NORMALIZE_ALIAS,
        "top": NORMALIZE_TOP,
    }[mode]
    return map_lookup_sql(table, f"upper(trim({expr}))")


TOP_COUNTRY: Dict[str, str] = dict(FOREIGN_TERRITORIES_MAPPING)
SUBDIV_TO_COUNTRY: Dict[str, str] = dict(SUBDIV_COUNTRY)
DEFAULT_SUBDIV: Dict[str, str] = dict(DEFAULT_SUBDIVISION)
SUBDIV_CITY_NAME: Dict[str, str] = dict(META_CITY)
SUBDIV_OWN_COUNTRY: Dict[str, str] = {
    c: s.country_code for c, s in SUBDIVISIONS.items()
}

# Render-layer projections (address.py:249-306, :532-544): state_name from
# the merged parent metadata (N8), subdivision display name, and the
# country display name with common_name precedence.
SUBDIV_STATE_NAME: Dict[str, str] = {
    c: m["state_name"] for c, m in SUBDIV_METADATA.items() if "state_name" in m
}
SUBDIV_DISPLAY_NAME: Dict[str, str] = {c: s.name for c, s in SUBDIVISIONS.items()}
COUNTRY_DISPLAY_NAME: Dict[str, str] = {
    c: (common if common else name) for c, (name, common) in COUNTRIES.items()
}

# T4/T5/T6 flattened to total scalar maps over the supported code space
# (territory.py:296-406) — the build-time precomputation SURVEY §2.B calls
# for; lookups stay JVM-side map literals / generated CASE arms.
PARENTS_CHAIN: Dict[str, str] = {
    c: ">".join(territory_parents_codes(c))
    for c in sorted(SUPPORTED_TERRITORY_CODES)
}
N_CHILDREN: Dict[str, str] = {
    c: str(len(territory_children_codes(c)))
    for c in sorted(SUPPORTED_TERRITORY_CODES)
}
ALIASES_CSV: Dict[str, str] = {
    c: ",".join(COUNTRY_ALIASES_OF[c]) for c in sorted(SUPPORTED_TERRITORY_CODES)
}
