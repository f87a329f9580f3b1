"""Vendored ISO 3166-2 subdivision database — full public domain.

The reference resolves subdivisions through the ``pycountry`` package
(/root/reference/postal_address/territory.py:202-209 builds
``supported_subdivision_codes`` from all of pycountry).  pycountry itself
is a thin wrapper over the Debian *iso-codes* project's ``iso_3166-2.json``
— the SAME public database vendored here (``data/iso_3166-2.json``, copied
from the system iso-codes package; upstream
https://salsa.debian.org/iso-codes-team/iso-codes, LGPL-2.1 data).  Using
it directly gives the full ~5,100-code domain the reference operates on,
not a curated subset.

Two deviations from the raw JSON, both deliberate:

* ``parent`` values are bare suffixes for most countries ("IDF") but full
  codes for a few ("GB-ENG"); both are normalized to full codes, matching
  pycountry's ``Subdivision.parent_code``.
* ``_REFERENCE_PINS`` re-pins the handful of rows where today's iso-codes
  data drifted from the reference-era pycountry database that the ported
  golden corpus (tests/test_core_normalize.py, tests/test_territory_core.py
  — themselves ports of the reference's pytest goldens) depends on, e.g.
  CZ-205 was renumbered from Kolín to Kutná Hora and Equatorial Guinea's
  region names switched Spanish->Portuguese upstream.  Pinning keeps
  behavior bit-identical to the reference on its own test corpus while the
  rest of the domain tracks the public database.

Lookups against this table are *total*: an unknown code resolves to None,
matching the reference behavior of resetting unrecognized codes
(/root/reference/postal_address/address.py:357-363).

Each entry: code -> (name, type, parent_code, country_code).
"""
from __future__ import annotations

import json
import os
from typing import Dict, NamedTuple, Optional


class Subdivision(NamedTuple):
    code: str
    name: str
    type: str
    parent_code: Optional[str]
    country_code: str


# (name, type) pins for codes where current iso-codes drifted from the
# reference-era pycountry data pinned by the ported reference goldens.
# Parent codes always come from the JSON (normalized below).
_REFERENCE_PINS: Dict[str, tuple] = {
    "FR-PAC": ("Provence-Alpes-Côte d'Azur", "Metropolitan region"),
    "FR-GF": ("Guyane", "Overseas region"),
    "FR-NC": ("Nouvelle-Calédonie", "Overseas collectivity"),
    "FR-YT": ("Mayotte", "Overseas departmental collectivity"),
    "TW-CYI": ("Chiayi", "Municipality"),
    "ES-ML": ("Melilla", "Autonomous city"),
    "FI-01": ("Ahvenanmaan maakunta", "Region"),
    "NO-21": ("Svalbard", "Arctic region"),
    "NO-22": ("Jan Mayen", "Arctic region"),
    "CN-TW": ("Taiwan", "Province"),
    "CN-HK": ("Hong Kong", "Special administrative region"),
    "CN-MO": ("Macao", "Special administrative region"),
    "GQ-C": ("Región Continental", "Region"),
    "GQ-I": ("Región Insular", "Region"),
    "GQ-AN": ("Annobón", "Province"),
    "GQ-BN": ("Bioko Norte", "Province"),
    "GQ-BS": ("Bioko Sur", "Province"),
    "GQ-CS": ("Centro Sur", "Province"),
    "CZ-205": ("Kolín", "District"),
    "KP-01": ("P'yŏngyang", "Capital city"),
    "KP-13": ("Nasŏn (Najin-Sŏnbong)", "Special city"),
    "KR-11": ("Seoul-teukbyeolsi", "Capital Metropolitan City"),
    "LV-RIX": ("Rīga", "Republican City"),
    "JP-13": ("Tōkyō", "Prefecture"),
    "GB-LND": ("London, City of", "City corporation"),
    "GB-BST": ("Bristol, City of", "Unitary authority"),
}

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data", "iso_3166-2.json")


def _read_raw_json() -> dict:
    """Read the vendored JSON zip-safely.  Under ``spark-submit
    --py-files engine.zip`` this package is imported via zipimport, where
    a ``__file__``-relative ``open()`` fails (the path points inside the
    archive); ``importlib.resources`` reads through both a filesystem
    package and a zip package.  The plain-``open`` fallback keeps exotic
    loaders (frozen/namespace) working."""
    try:
        from importlib import resources

        text = (
            resources.files(__package__) / "data" / "iso_3166-2.json"
        ).read_text(encoding="utf-8")
    except Exception:
        with open(_DATA_PATH, encoding="utf-8") as fh:
            text = fh.read()
    return json.loads(text)


def _load() -> Dict[str, Subdivision]:
    raw = _read_raw_json()["3166-2"]
    out: Dict[str, Subdivision] = {}
    for entry in raw:
        code = entry["code"]
        country_code = code.split("-", 1)[0]
        parent = entry.get("parent")
        if parent is not None and "-" not in parent:
            parent = f"{country_code}-{parent}"
        name, type_ = _REFERENCE_PINS.get(code, (entry["name"], entry["type"]))
        out[code] = Subdivision(code, name, type_, parent, country_code)
    return out


SUBDIVISIONS: Dict[str, Subdivision] = _load()
