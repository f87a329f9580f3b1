"""Vectorized address normalize / validate / render semantic core.

One implementation of the reference's whole record lifecycle
(/root/reference/postal_address/address.py:308-426 normalize,
:428-505 validate, :249-306 render), expressed over pandas DataFrames so
the exact same code runs:

* inside Arrow-batched pandas UDFs on Spark executors (the hot path), and
* under plain pytest through the thin scalar ``AddressRecord`` wrapper
  (reference-parity goldens).

Per-row exceptions become data: the reference raises ``InvalidAddress``
(address.py:43-80); a distributed engine cannot raise per row, so errors
land in ``norm_inconsistent`` / ``required_fields`` / ``invalid_fields`` /
``inconsistent_fields`` columns instead.

All territory lookups are ``Series.map`` against the small broadcast maps
from :mod:`postal_address_spark.refdata` — never joins, never per-row
Python in the reference-semantics path.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..refdata import (
    COUNTRIES,
    DEFAULT_SUBDIVISION,
    SUBDIVISIONS,
    SUBDIV_COUNTRY,
    SUBDIV_METADATA,
    SUPPORTED_TERRITORY_CODES,
    subdivision_type_id,
)
from ..refdata.territory_tables import COUNTRY_ALIASES, RESERVED_COUNTRY_CODES

BASE_FIELD_IDS = (
    "line1",
    "line2",
    "postal_code",
    "city_name",
    "country_code",
    "subdivision_code",
)
REQUIRED_FIELDS = ("line1", "postal_code", "city_name", "country_code")

# Precomputed projections of the merged parent metadata
# (refdata.SUBDIV_METADATA bakes the walk of address.py:382-385).
_META_CITY: Dict[str, str] = {
    code: meta["city_name"]
    for code, meta in SUBDIV_METADATA.items()
    if "city_name" in meta
}
_META_STATE: Dict[str, str] = {
    code: meta["state_name"]
    for code, meta in SUBDIV_METADATA.items()
    if "state_name" in meta
}
_SUBDIV_OWN_COUNTRY: Dict[str, str] = {
    code: sub.country_code for code, sub in SUBDIVISIONS.items()
}
_SUBDIV_NAME: Dict[str, str] = {c: s.name for c, s in SUBDIVISIONS.items()}
_SUBDIV_TYPE: Dict[str, str] = {c: s.type for c, s in SUBDIVISIONS.items()}
_COUNTRY_DISPLAY: Dict[str, str] = {
    code: (common if common else name) for code, (name, common) in COUNTRIES.items()
}
_TYPE_ID_OF: Dict[str, str] = {
    code: subdivision_type_id(sub) for code, sub in SUBDIVISIONS.items()
}

_SUPPORTED_LIST = list(SUPPORTED_TERRITORY_CODES)


def _via_uniques(s: pd.Series, fn) -> pd.Series:
    """Apply a pure value->value Series transform through dictionary
    encoding: factorize (C-speed hash pass), transform the distinct
    values only, fan the results back out.

    Address fields are highly repetitive (cities, countries, postals) —
    per-row regex work on 10^6-row Arrow batches collapses to per-distinct
    work.  Skipped when cardinality is near-unique (fn on the raw Series
    is then cheaper than the factorize round-trip)."""
    n = len(s)
    if n < 1024:
        return fn(s)
    codes, uniques = s.factorize(use_na_sentinel=True)
    if len(uniques) > 0.6 * n:
        return fn(s)
    transformed = fn(
        pd.Series(uniques.to_numpy(dtype=object), dtype=object)
    ).to_numpy(dtype=object)
    out = np.empty(n, dtype=object)
    mask = codes >= 0
    out[mask] = transformed[codes[mask]]
    out[~mask] = None
    return pd.Series(out, index=s.index, dtype=object)


def _clean_str(s: pd.Series) -> pd.Series:
    """Whitespace collapse + blank reset (address.py:337-346)."""

    def run(v: pd.Series) -> pd.Series:
        out = v.str.replace(r"\s+", " ", regex=True).str.strip()
        return out.where(out.notna() & (out != ""), None)

    return _via_uniques(s, run)


def _map_or_keep(s: pd.Series, table: Dict[str, str]) -> pd.Series:
    """dict.get(x, x) vectorized."""
    mapped = s.map(table)
    return mapped.where(mapped.notna(), s)


def normalize_frame(
    df: pd.DataFrame, strict: bool = True, replace_city_name: bool = True
) -> pd.DataFrame:
    """Run the full normalization chain over a frame of base fields.

    Input columns: the six BASE_FIELD_IDS (object dtype, str-or-None).
    Output: normalized base fields plus derived columns::

        state_name, subdivision_name, subdivision_type_name,
        subdivision_type_id, country_name, subdiv_metadata (dict),
        norm_inconsistent (list[(field, field)] or None)

    Step order mirrors address.py:308-426 exactly — reordering changes
    outcomes (SURVEY.md §2.C).
    """
    n = len(df)
    idx = df.index
    cols = {f: df[f].astype(object) for f in BASE_FIELD_IDS}

    # N1 — postal-code canonicalization (address.py:326-335).
    def _postal_canon(pc: pd.Series) -> pd.Series:
        pc = pc.str.upper()
        pc = pc.str.replace(r"[^A-Z0-9 -]", "", regex=True)
        pc = pc.str.replace(r"[^A-Z0-9]*-+[^A-Z0-9]*", "-", regex=True)
        return pc.str.strip("-")

    cols["postal_code"] = _via_uniques(cols["postal_code"], _postal_canon)

    # N2 + N3 — whitespace collapse then blank reset (address.py:337-346).
    for f in BASE_FIELD_IDS:
        cols[f] = _clean_str(cols[f])

    # N4 — swap lines if the first is empty (address.py:348-350).
    l1, l2 = cols["line1"], cols["line2"]
    swap = l1.isna() & l2.notna()
    cols["line1"] = l1.where(~swap, l2)
    cols["line2"] = l2.where(~swap, None)

    # N5 — territory-code normalization, resolve_aliases=False
    # (address.py:352-363 calling territory.py:212-229): membership gate
    # (unknown -> None), then reserved codes, then country aliases.
    def _code_norm(v: pd.Series) -> pd.Series:
        t = v.str.strip().str.upper()
        t = t.where(t.isin(_SUPPORTED_LIST), None)
        t = _map_or_keep(t, RESERVED_COUNTRY_CODES)
        return _map_or_keep(t, COUNTRY_ALIASES)

    for f in ("country_code", "subdivision_code"):
        cols[f] = _via_uniques(cols[f], _code_norm)

    # N6 — default-subdivision guess; country reset for re-derivation
    # (address.py:365-371, territory.py:270-293).
    cc, sc = cols["country_code"], cols["subdivision_code"]
    guess = cc.map(DEFAULT_SUBDIVISION)
    take = cc.notna() & sc.isna() & guess.notna()
    cols["subdivision_code"] = sc.where(~take, guess)
    cols["country_code"] = cc.where(~take, None)

    # N7 + N8 — parent-derived metadata (address.py:373-426).
    cc, sc = cols["country_code"], cols["subdivision_code"]
    has_sub = sc.notna()
    new_cc = sc.map(SUBDIV_COUNTRY)
    meta_city = sc.map(_META_CITY)
    if not replace_city_name:
        # User-entered city wins: pop the derived city (address.py:387-388).
        meta_city = meta_city.where(cols["city_name"].isna(), None)

    inconsistent = pd.Series([None] * n, index=idx, dtype=object)
    if strict:
        # N9 — strict conflict checks (address.py:390-424).  Per the
        # metadata-collision invariant only country_code and city_name can
        # conflict; country_code is checked first (dict order), so a row
        # with both reports only the country conflict, like the reference.
        own_cc = sc.map(_SUBDIV_OWN_COUNTRY)
        cc_conflict = (
            has_sub & cc.notna() & (cc != new_cc) & (cc != own_cc)
        )
        city_conflict = (
            has_sub
            & ~cc_conflict
            & cols["city_name"].notna()
            & meta_city.notna()
            & (cols["city_name"] != meta_city)
        )
        inconsistent = inconsistent.where(
            ~cc_conflict, pd.Series([[("country_code", "subdivision_code")]] * n, index=idx)
        )
        inconsistent = inconsistent.where(
            ~city_conflict, pd.Series([[("city_name", "subdivision_code")]] * n, index=idx)
        )
        blocked = cc_conflict | city_conflict
    else:
        blocked = pd.Series(False, index=idx)

    # Apply parent metadata on non-blocked rows (the reference's
    # ``_fields.update(parent_metadata)`` at address.py:426; on a strict
    # conflict the exception fires before the update, leaving fields as-is).
    apply = has_sub & ~blocked
    cols["country_code"] = cc.where(~apply, new_cc)
    cols["city_name"] = cols["city_name"].where(
        ~(apply & meta_city.notna()), meta_city
    )

    out = pd.DataFrame({f: cols[f] for f in BASE_FIELD_IDS}, index=idx)
    sc = out["subdivision_code"]
    meta = sc.map(SUBDIV_METADATA)
    meta = meta.where(apply, None)
    out["subdiv_metadata"] = meta
    out["state_name"] = sc.map(_META_STATE).where(apply, None)
    out["subdivision_name"] = sc.map(_SUBDIV_NAME)
    out["subdivision_type_name"] = sc.map(_SUBDIV_TYPE)
    out["subdivision_type_id"] = sc.map(_TYPE_ID_OF)
    out["country_name"] = out["country_code"].map(_COUNTRY_DISPLAY)
    out["norm_inconsistent"] = inconsistent
    return out


# Precomputed validation artifacts: per-row Python object construction is
# the enemy inside an Arrow batch (a list comprehension over the batch was
# 80% of the whole normalize UDF).  The 16 possible missing-required sets
# and the two inconsistency values are immutable and SHARED across rows.
# Invariant: these singletons are only ever READ — Arrow serialization
# copies their values when a column crosses the UDF boundary, and the
# scalar shim only reads — so nothing may mutate these columns in place
# (an in-place append would corrupt every row sharing the object).
_REQ_LOOKUP = np.empty(1 << len(REQUIRED_FIELDS), dtype=object)
for _code in range(1 << len(REQUIRED_FIELDS)):
    _REQ_LOOKUP[_code] = sorted(
        f for _bit, f in enumerate(REQUIRED_FIELDS) if (_code >> _bit) & 1
    )
_EMPTY_DICT: Dict[str, str] = {}
_EMPTY_LIST: List[Tuple[str, str]] = []
_CC_SC_PAIR: List[Tuple[str, str]] = [("country_code", "subdivision_code")]
_COUNTRY_LIST = list(COUNTRIES)
_SUBDIVISION_LIST = list(SUBDIVISIONS)


def validate_frame(normalized: pd.DataFrame) -> pd.DataFrame:
    """V1-V4 validation as columns (address.py:428-505).

    Adds ``required_fields`` (sorted list), ``invalid_fields`` (dict),
    ``inconsistent_fields`` (list of pairs) and ``is_valid`` (bool).
    Fully vectorized: only the invalid-code minority rows take a Python
    loop (they need per-row dict values).
    """
    n = len(normalized)
    idx = normalized.index

    codes = np.zeros(n, dtype=np.int64)
    cc_required = None
    for bit, f in enumerate(REQUIRED_FIELDS):
        mask = normalized[f].isna().to_numpy()
        if f == "country_code":
            cc_required = mask
        codes |= mask.astype(np.int64) << bit
    required = pd.Series(_REQ_LOOKUP[codes], index=idx, dtype=object)

    cc, sc = normalized["country_code"], normalized["subdivision_code"]
    cc_invalid = (cc.notna() & ~cc.isin(_COUNTRY_LIST)).to_numpy()
    sc_invalid = (sc.notna() & ~sc.isin(_SUBDIVISION_LIST)).to_numpy()
    # .fill stores the object reference per element; np.array would try to
    # interpret a list-of-sequences as a 2-D array.
    inv = np.empty(n, dtype=object)
    inv.fill(_EMPTY_DICT)
    bad = np.nonzero(cc_invalid | sc_invalid)[0]
    if len(bad):
        ccv = cc.to_numpy(dtype=object)
        scv = sc.to_numpy(dtype=object)
        for i in bad:
            d = {}
            if cc_invalid[i]:
                d["country_code"] = ccv[i]
            if sc_invalid[i]:
                d["subdivision_code"] = scv[i]
            inv[i] = d
    invalid = pd.Series(inv, index=idx, dtype=object)

    # V3 — country vs subdivision consistency (address.py:473-505), only
    # when neither field is already required/invalid.
    inferred = sc.map(SUBDIV_COUNTRY)
    consistent = (sc.isna() | (inferred == cc)).to_numpy()
    gate = ~(cc_required | cc_invalid | sc_invalid)
    inconsistent_mask = gate & ~consistent
    inc = np.empty(n, dtype=object)
    inc.fill(_EMPTY_LIST)
    for i in np.nonzero(inconsistent_mask)[0]:  # minority rows only
        inc[i] = _CC_SC_PAIR
    inconsistent = pd.Series(inc, index=idx, dtype=object)

    out = normalized.copy()
    out["required_fields"] = required
    out["invalid_fields"] = invalid
    out["inconsistent_fields"] = inconsistent
    out["is_valid"] = pd.Series(
        (codes == 0) & ~cc_invalid & ~sc_invalid & ~inconsistent_mask,
        index=idx,
    )
    return out


def _join_optional(parts: List[Tuple[pd.Series, pd.Series]], sep: str) -> pd.Series:
    """Accumulate present parts with a separator, fully vectorized."""
    acc = None
    for value, present in parts:
        v = value.astype(object).where(present, None)
        if acc is None:
            acc = v.where(present, "")
        else:
            acc = np.where(
                present & (acc != ""), acc + sep + v.astype(object).fillna(""), acc
            )
            acc = pd.Series(acc, index=value.index, dtype=object)
            acc = acc.where(~(present & (acc == "")), v)
    return acc if acc is not None else pd.Series(dtype=object)


def render_frame(normalized: pd.DataFrame, separator: str = "\n") -> pd.Series:
    """Human-friendly address block (address.py:249-306), vectorized.

    Line structure: line1, line2, "<postal> - <city>, <state>", a
    non-redundant subdivision-name line, then the country display name.
    """
    idx = normalized.index
    l1 = normalized["line1"]
    l2 = normalized["line2"]
    pc = normalized["postal_code"]
    cn = normalized["city_name"]
    st = normalized["state_name"]
    sn = normalized["subdivision_name"]
    co = normalized["country_name"]

    # third line: [", ".join(city?, state?)] with postal prefixed by " - ".
    cs = pd.Series(
        np.where(
            cn.notna() & st.notna(),
            cn.astype(object).fillna("") + ", " + st.astype(object).fillna(""),
            np.where(cn.notna(), cn, np.where(st.notna(), st, "")),
        ),
        index=idx,
        dtype=object,
    )
    line3 = pd.Series(
        np.where(pc.notna(), pc.astype(object).fillna("") + " - " + cs, cs),
        index=idx,
        dtype=object,
    )
    line3 = line3.where(line3 != "", None)

    # Subdivision line only when non-redundant vs city/state/country
    # (address.py:287-299).
    redundant = (
        sn.isna()
        | (sn == cn.where(cn.notna(), np.nan))
        | (sn == st.where(st.notna(), np.nan))
        | (sn == co.where(co.notna(), np.nan))
    )
    subdiv_line = sn.where(~redundant, None)

    return _join_optional(
        [
            (l1, l1.notna()),
            (l2, l2.notna()),
            (line3, line3.notna()),
            (subdiv_line, subdiv_line.notna()),
            (co, co.notna()),
        ],
        separator,
    )


# ---------------------------------------------------------------------------
# Scalar wrapper — reference-parity surface for pytest (no Spark)
# ---------------------------------------------------------------------------


class InvalidAddressError(ValueError):
    """Errors-as-data materialized back into an exception for the scalar
    API (mirrors reference InvalidAddress, address.py:43-80)."""

    def __init__(
        self,
        required_fields: Optional[set] = None,
        invalid_fields: Optional[Dict[str, str]] = None,
        inconsistent_fields: Optional[set] = None,
    ) -> None:
        super().__init__()
        self.required_fields = required_fields or set()
        self.invalid_fields = invalid_fields or {}
        self.inconsistent_fields = inconsistent_fields or set()

    def __str__(self) -> str:
        reasons = []
        if self.required_fields:
            reasons.append(f"{', '.join(sorted(self.required_fields))} required")
        if self.invalid_fields:
            kv = ", ".join(
                sorted(f"{k}={v!r}" for k, v in self.invalid_fields.items())
            )
            reasons.append(f"{kv} invalid")
        for f1, f2 in sorted(self.inconsistent_fields):
            reasons.append(f"{f1} is inconsistent with {f2}")
        return f"{'; '.join(reasons)}."


class AddressRecord:
    """Scalar view over the vectorized core (1-row frame round-trip).

    Only the semantic surface the pipeline relies on is exposed — this is a
    test shim, not a public object model — but it now also carries the
    reference's dict protocol (address.py:203-247): the record proxies a
    ``_fields`` dict of the six base fields plus the subdivision-injected
    metadata, with ``__setitem__``/``__setattr__`` accepting raw values
    (visible immediately, like the reference) and ``normalize()``
    re-running the pipeline over the current base fields.
    """

    def __init__(
        self,
        strict: bool = True,
        replace_city_name: bool = True,
        **fields: Optional[str],
    ) -> None:
        unknown = set(fields) - set(BASE_FIELD_IDS)
        if unknown:
            raise KeyError(f"{unknown!r} fields are not allowed to be set freely.")
        for key, value in fields.items():
            if not (value is None or isinstance(value, str)):
                raise TypeError(f"{key} must be str or None")
        self.__dict__["_strict"] = strict
        self.__dict__["_replace_city_name"] = replace_city_name
        self.__dict__["_fields"] = {f: fields.get(f) for f in BASE_FIELD_IDS}
        self.normalize()

    def normalize(self) -> None:
        """Re-run the N1-N9 chain over the CURRENT base fields
        (address.py:308-424's explicit normalize entrypoint)."""
        base = {f: self._fields.get(f) for f in BASE_FIELD_IDS}
        frame = pd.DataFrame([base], dtype=object)
        normalized = normalize_frame(
            frame, strict=self._strict,
            replace_city_name=self._replace_city_name,
        )
        inconsistent = normalized["norm_inconsistent"].iloc[0]
        if inconsistent:
            raise InvalidAddressError(inconsistent_fields={tuple(p) for p in inconsistent})
        row = validate_frame(normalized).iloc[0]
        clean = {
            f: (None if row[f] is None or (isinstance(row[f], float) and pd.isna(row[f])) else row[f])
            for f in BASE_FIELD_IDS
        }
        meta = row["subdiv_metadata"]
        meta = dict(meta) if isinstance(meta, dict) else {}
        # Base fields win: the normalized row already applied every
        # metadata override the semantics allow (replace_city_name,
        # strict-conflict gating — address.py:386-414), so raw metadata
        # must not re-override them here.
        fields = dict(clean)
        for key, value in meta.items():
            if key not in fields:
                fields[key] = value
        self.__dict__["_row"] = row
        self.__dict__["_meta_keys"] = frozenset(
            k for k in meta if k not in BASE_FIELD_IDS
        )
        self.__dict__["_fields"] = fields

    # Display projections are @property in the reference (address.py:
    # 532-572), and Python properties beat __getattr__ — so a metadata key
    # that happens to collide (e.g. GB-ENG's country-typed parent injects
    # 'country_name'='England' under GB-LND) must NOT shadow them.
    _DISPLAY_PROPS = frozenset(
        {"country_name", "subdivision_name", "subdivision_type_name",
         "subdivision_type_id"}
    )

    def __getattr__(self, name: str) -> Any:
        row = self.__dict__.get("_row")
        if name in self._DISPLAY_PROPS and row is not None:
            value = row[name]
            return None if (isinstance(value, float) and pd.isna(value)) else value
        fields = self.__dict__.get("_fields", {})
        if name in fields:
            return fields[name]
        if name in self.__dict__.get("_meta_keys", frozenset()):
            # metadata key deleted via the dict protocol — gone, like the
            # reference (tests/test_address.py:95-102)
            raise AttributeError(name)
        if row is not None and name in row.index:
            value = row[name]
            return None if (isinstance(value, float) and pd.isna(value)) else value
        raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        if name in BASE_FIELD_IDS:
            self[name] = value
            return
        object.__setattr__(self, name, value)

    # -- dict protocol: proxy to _fields (address.py:203-247) --

    def __len__(self) -> int:
        return len(self._fields)

    def __iter__(self):
        yield from self._fields

    def __contains__(self, key: object) -> bool:
        return key in self._fields

    def __getitem__(self, key: str) -> Any:
        if not isinstance(key, str):
            raise TypeError(key)
        return self._fields[key]

    def __setitem__(self, key: str, value: Any) -> None:
        if not isinstance(key, str):
            raise TypeError(key)
        if not (value is None or isinstance(value, str)):
            raise TypeError(f"{key} must be str or None")
        if key not in BASE_FIELD_IDS:
            raise KeyError(key)
        self._fields[key] = value

    def __delitem__(self, key: str) -> None:
        if key in BASE_FIELD_IDS:
            self._fields[key] = None
        else:
            del self._fields[key]

    def keys(self):
        return self._fields.keys()

    def values(self):
        return self._fields.values()

    def items(self):
        return self._fields.items()

    def __bool__(self) -> bool:
        return not self.empty

    def validate(self) -> None:
        row = self._row
        if not row["is_valid"]:
            raise InvalidAddressError(
                required_fields=set(row["required_fields"]),
                invalid_fields=dict(row["invalid_fields"]),
                inconsistent_fields={tuple(p) for p in row["inconsistent_fields"]},
            )

    @property
    def valid(self) -> bool:
        return bool(self._row["is_valid"])

    @property
    def empty(self) -> bool:
        return all(not value for value in self._fields.values())

    def render(self, separator: str = "\n") -> str:
        # Render over the last-normalized row overlaid with any raw field
        # mutations (the reference renders from the live _fields dict).
        # Only base fields and the metadata-backed state_name overlay;
        # subdivision_name/country_name are display projections of the
        # codes, never of injected metadata (see _DISPLAY_PROPS).
        row = self._row.copy()
        for f in BASE_FIELD_IDS:
            row[f] = self._fields.get(f)
        if "state_name" in self._meta_keys:
            row["state_name"] = self._fields.get("state_name")
        return render_frame(row.to_frame().T, separator).iloc[0]

    def __str__(self) -> str:
        return self.render()
