"""Territory code-space API over the vendored refdata.

Re-implements, from the public ISO 3166 classification + the alias tables
in ``territory_tables.py``, every territory operation the reference exposes
(/root/reference/postal_address/territory.py:178-406 and the
subdivision-type utilities at address.py:609-753).

Everything here is either a pure function of static data or a dict built
once at import.  The derived flat maps (PARENTS_CODES, CHILDREN_CODES,
COUNTRY_ALIASES_OF, DEFAULT_SUBDIVISION, SUBDIV_COUNTRY, SUBDIV_METADATA)
are what the Spark layer ships to executors inside pandas-UDF closures:
tiny constants, so territory resolution is a vectorized ``Series.map`` and
never a shuffle join.
"""
from __future__ import annotations

import re
from typing import Dict, FrozenSet, List, Optional, Set

from .iso3166_1 import COUNTRIES
from .iso3166_2 import SUBDIVISIONS, Subdivision
from .territory_tables import (
    COUNTRY_ALIASES,
    COUNTRY_ALIAS_TO_SUBDIVISION,
    FOREIGN_TERRITORIES_MAPPING,
    RESERVED_COUNTRY_CODES,
    REVERSE_MAPPING,
    SUBDIVISION_ALIASES,
    SUBDIVISION_COUNTRIES,
)

# ---------------------------------------------------------------------------
# Supported code spaces (reference: territory.py:178-209)
# ---------------------------------------------------------------------------

SUPPORTED_COUNTRY_CODES: FrozenSet[str] = frozenset(
    set(COUNTRIES)
    | set(COUNTRY_ALIASES)
    | set(RESERVED_COUNTRY_CODES)
    | set(COUNTRY_ALIAS_TO_SUBDIVISION)
)

SUPPORTED_SUBDIVISION_CODES: FrozenSet[str] = frozenset(SUBDIVISIONS)

SUPPORTED_TERRITORY_CODES: FrozenSet[str] = (
    SUPPORTED_COUNTRY_CODES | SUPPORTED_SUBDIVISION_CODES
)


def supported_country_codes() -> FrozenSet[str]:
    return SUPPORTED_COUNTRY_CODES


def supported_subdivision_codes() -> FrozenSet[str]:
    return SUPPORTED_SUBDIVISION_CODES


def supported_territory_codes() -> FrozenSet[str]:
    return SUPPORTED_TERRITORY_CODES


# ---------------------------------------------------------------------------
# Scalar territory operations (reference: territory.py:212-293)
# ---------------------------------------------------------------------------


def territory_attachment(country_code: str) -> str:
    """Foreign territory -> its sovereign country (territory.py:238-245)."""
    return FOREIGN_TERRITORIES_MAPPING.get(country_code, country_code)


def normalize_territory_code(
    territory_code: str,
    resolve_aliases: bool = True,
    resolve_top_country: bool = False,
) -> str:
    """Fixed rewrite chain over a territory code (territory.py:212-235).

    Order matters and is part of the semantics: membership gate, then
    reserved codes, then country aliases, then (optionally) subdivision
    aliases and subdivision->country codes, then (optionally) top-country
    attachment.
    """
    territory_code = territory_code.strip().upper()
    if territory_code not in SUPPORTED_TERRITORY_CODES:
        raise ValueError(f"Unrecognized territory code: {territory_code!r}")
    territory_code = RESERVED_COUNTRY_CODES.get(territory_code, territory_code)
    territory_code = COUNTRY_ALIASES.get(territory_code, territory_code)
    if resolve_aliases:
        territory_code = SUBDIVISION_ALIASES.get(territory_code, territory_code)
        territory_code = SUBDIVISION_COUNTRIES.get(territory_code, territory_code)
    if resolve_top_country:
        territory_code = territory_attachment(territory_code)
    return territory_code


def country_from_subdivision(subdivision_code: str) -> Optional[str]:
    """Normalized country code of a subdivision (territory.py:248-267)."""
    code = SUBDIVISION_COUNTRIES.get(subdivision_code, subdivision_code)
    if code in SUPPORTED_COUNTRY_CODES:
        return code
    subdiv = SUBDIVISIONS.get(subdivision_code)
    if subdiv is None:
        return None
    return subdiv.country_code


def _build_default_subdivision() -> Dict[str, str]:
    """Countries with a unique 1:1 subdivision (territory.py:270-293)."""
    index: Dict[str, Set[str]] = {}
    for subdiv_code, alias_code in SUBDIVISION_COUNTRIES.items():
        if len(alias_code) == 2:
            index.setdefault(alias_code, set()).add(subdiv_code)
    for alias_code, subdiv_code in COUNTRY_ALIAS_TO_SUBDIVISION.items():
        index.setdefault(alias_code, set()).add(subdiv_code)
    return {cc: next(iter(subs)) for cc, subs in index.items() if len(subs) == 1}


DEFAULT_SUBDIVISION: Dict[str, str] = _build_default_subdivision()


def default_subdivision_code(country_code: str) -> Optional[str]:
    return DEFAULT_SUBDIVISION.get(country_code)


# ---------------------------------------------------------------------------
# Hierarchy walks, flattened at import (reference: territory.py:296-373)
# ---------------------------------------------------------------------------


def territory_parents_codes(
    territory_code: str, include_country: bool = True
) -> List[str]:
    """[self, parent, ..., country] chain (territory.py:326-373).

    Resolves COUNTRY_ALIAS_TO_SUBDIVISION first, then full alias
    normalization; a code landing on a country returns just [country] (or
    [] without the country).
    """
    territory_code = COUNTRY_ALIAS_TO_SUBDIVISION.get(territory_code, territory_code)
    territory_code = normalize_territory_code(territory_code)
    if territory_code in SUPPORTED_COUNTRY_CODES:
        return [territory_code] if include_country else []
    chain: List[str] = []
    code: Optional[str] = territory_code
    while code:
        subdiv = SUBDIVISIONS[code]
        chain.append(code)
        code = subdiv.parent_code
    if include_country:
        chain.append(SUBDIVISIONS[chain[-1]].country_code)
    return chain


def territory_parents_subdivisions(territory_code: str) -> List[Subdivision]:
    """Subdivision objects of the parent chain, country excluded.

    Mirrors ``territory_parents(code, include_country=False)``
    (territory.py:326-359) for the metadata-derivation step
    (address.py:382-385).
    """
    return [
        SUBDIVISIONS[c]
        for c in territory_parents_codes(territory_code, include_country=False)
    ]


# One-pass indexes so the children walk is O(result), not an O(N) scan of
# all ~5,100 subdivisions per call (N_CHILDREN below calls it once per
# supported territory code).
_BY_COUNTRY: Dict[str, Set[str]] = {}
_BY_PARENT: Dict[str, Set[str]] = {}
for _s in SUBDIVISIONS.values():
    _BY_COUNTRY.setdefault(_s.country_code, set()).add(_s.code)
    if _s.parent_code is not None:
        _BY_PARENT.setdefault(_s.parent_code, set()).add(_s.code)


def territory_children_codes(territory_code: str, include_self: bool = False) -> Set[str]:
    """All transitive subdivision codes under a territory (territory.py:296-323)."""
    codes: Set[str] = set()
    code = normalize_territory_code(territory_code)
    if code in SUPPORTED_COUNTRY_CODES:
        codes |= _BY_COUNTRY.get(code, set())
    else:
        for child in _BY_PARENT.get(code, ()):
            codes |= territory_children_codes(child, include_self=True)
    if include_self:
        codes.add(code)
    return codes


def country_aliases(territory_code: str) -> Set[str]:
    """All valid country-code aliases of a territory (territory.py:376-406).

    Used by the strict-conflict check (address.py:399-414) and, in the
    pipeline, as the country-agreement feature of the pair scorer.
    """
    country_codes: Set[str] = set()
    if territory_code in SUPPORTED_COUNTRY_CODES:
        country_codes.add(territory_code)
    else:
        subdiv = SUBDIVISIONS[territory_code]
        parent_code = subdiv.parent_code or subdiv.country_code
        country_codes |= country_aliases(parent_code)
        if territory_code in SUBDIVISION_COUNTRIES:
            country_codes.add(SUBDIVISION_COUNTRIES[territory_code])
    for mapped_code in REVERSE_MAPPING.get(territory_code, ()):
        country_codes |= country_aliases(mapped_code)
    return country_codes


# ---------------------------------------------------------------------------
# Subdivision type IDs + metadata (reference: address.py:609-753)
# ---------------------------------------------------------------------------

_NON_WORD = re.compile(r"[^a-z0-9]+")


def _slugify(text: str) -> str:
    """Python-friendly ID: lower-case, non-alphanumeric runs -> '_'.

    Equivalent, over the ISO subdivision type vocabulary, to
    boltons.strutils.slugify as used at address.py:720.
    """
    return _NON_WORD.sub("_", text.lower()).strip("_")


def subdivision_type_id(subdivision: Subdivision) -> str:
    """Slugified subdivision type; any 'city'/'municipality' token makes it
    a city (address.py:609-727)."""
    type_id = _slugify(subdivision.type)
    if {"city", "municipality"} & set(type_id.split("_")):
        type_id = "city"
    return type_id


def subdivision_metadata(subdivision: Subdivision) -> Dict[str, str]:
    """Per-subdivision derived field map (address.py:730-753).

    The reference stores the subdivision *object* under the bare type-id
    key; we store its code (the engine's columns are strings-only, matching
    the reference's own field type system at address.py:220-221).
    """
    type_id = subdivision_type_id(subdivision)
    return {
        type_id: subdivision.code,
        f"{type_id}_area_code": subdivision.code,
        f"{type_id}_name": subdivision.name,
        f"{type_id}_type_name": subdivision.type,
    }


def country_name(country_code: Optional[str]) -> Optional[str]:
    """common_name-over-name precedence (address.py:532-544)."""
    if not country_code:
        return None
    entry = COUNTRIES.get(country_code)
    if entry is None:
        return None
    name, common = entry
    return common if common else name


# ---------------------------------------------------------------------------
# Flattened broadcast maps for the vectorized Spark layer
# ---------------------------------------------------------------------------

# subdivision code -> ordered parent-chain codes incl. country
PARENTS_CODES: Dict[str, List[str]] = {
    code: territory_parents_codes(code) for code in SUBDIVISIONS
}

# subdivision code -> normalized country code
SUBDIV_COUNTRY: Dict[str, str] = {
    code: country_from_subdivision(code)  # type: ignore[misc]
    for code in SUBDIVISIONS
}

# subdivision code -> merged parent metadata (self first, parents override
# on type-id collision, exactly the update order of address.py:382-385)
SUBDIV_METADATA: Dict[str, Dict[str, str]] = {}
for _code in SUBDIVISIONS:
    _meta: Dict[str, str] = {}
    for _parent in territory_parents_subdivisions(_code):
        _meta.update(subdivision_metadata(_parent))
    SUBDIV_METADATA[_code] = _meta

# territory code -> sorted country aliases (scoring feature + strict check)
COUNTRY_ALIASES_OF: Dict[str, List[str]] = {
    code: sorted(country_aliases(code)) for code in SUPPORTED_TERRITORY_CODES
}

# subdivision code -> derived city_name when a city-typed parent exists
# (the SUBDIVISION_METADATA_WHITELIST collision path, address.py:122)
META_CITY: Dict[str, str] = {
    code: meta["city_name"]
    for code, meta in SUBDIV_METADATA.items()
    if "city_name" in meta
}
