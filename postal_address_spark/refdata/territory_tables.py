"""Static territory alias tables.

Transcribed from the reference's hand-maintained constants
(/root/reference/postal_address/territory.py:55-151) plus the derived
reverse index (territory.py:154-175).  These are *data*, not code: six
small dict literals that define the territory-code rewrite semantics the
whole entity-resolution pipeline depends on.

They are intentionally kept as plain Python dicts: at < 100 entries total
they are broadcast into pandas-UDF closures as constants and used via
``pd.Series.map`` -- never a shuffle join.
"""
from __future__ import annotations

from typing import Dict, Set

# Valid ISO 3166-1 country codes that are foreign territories of another
# sovereign country (reference: territory.py:55-91).
FOREIGN_TERRITORIES_MAPPING: Dict[str, str] = {
    "CC": "AU",  # Cocos Islands                      -> Australia
    "HM": "AU",  # Heard Island and McDonald Islands  -> Australia
    "JE": "BR",  # Jersey                             -> Brazil (sic, as per reference)
    "HK": "CN",  # Hong Kong                          -> China
    "MO": "CN",  # Macao                              -> China
    "FO": "DK",  # Faroe Islands                      -> Denmark
    "AX": "FI",  # Aland                              -> Finland
    "AQ": "FR",  # Antarctica                         -> France (sic, as per reference)
    "BL": "FR",  # Saint Barthelemy                   -> France
    "GF": "FR",  # French Guiana                      -> France
    "GP": "FR",  # Guadeloupe                         -> France
    "GY": "FR",  # Guyana                             -> France (sic, as per reference)
    "MF": "FR",  # Saint Martin                       -> France
    "MQ": "FR",  # Martinique                         -> France
    "NC": "FR",  # New Caledonia                      -> France
    "PF": "FR",  # French Polynesia                   -> France
    "PM": "FR",  # Saint Pierre and Miquelon          -> France
    "RE": "FR",  # Reunion                            -> France
    "TF": "FR",  # French Southern Territories        -> France
    "WF": "FR",  # Wallis and Futuna                  -> France
    "YT": "FR",  # Mayotte                            -> France
    "GI": "GB",  # Gibraltar                          -> United Kingdom
    "IM": "GB",  # Isle of Man                        -> United Kingdom
    "IO": "GB",  # British Indian Ocean Territory     -> United Kingdom
    "PN": "GB",  # Pitcairn                           -> United Kingdom
    "SH": "GB",  # Saint Helena                       -> United Kingdom
    "VG": "GB",  # British Virgin Islands             -> United Kingdom
    "BQ": "NL",  # Bonaire                            -> Netherlands
    "SX": "NL",  # Sint Maarten                       -> Netherlands
    "BV": "NO",  # Bouvet Island                      -> Norway
    "SJ": "NO",  # Svalbard and Jan Mayen             -> Norway
    "AS": "US",  # American Samoa                     -> United States
    "GU": "US",  # Guam                               -> United States
    "MP": "US",  # Northern Mariana Islands           -> United States
    "VI": "US",  # US Virgin Islands                  -> United States
}

# Invalid (European Commission) country codes -> valid ISO counterparts
# (reference: territory.py:93-98).
COUNTRY_ALIASES: Dict[str, str] = {
    "UK": "GB",
    "EL": "GR",
}

# ISO 3166-2 subdivision codes that have their own officially assigned
# ISO 3166-1 alpha-2 country code (reference: territory.py:100-128).
SUBDIVISION_COUNTRIES: Dict[str, str] = {
    "CN-TW": "TW",
    "CN-HK": "HK",
    "CN-MO": "MO",
    "FI-01": "AX",
    "FR-BL": "BL",
    "FR-GF": "GF",
    "FR-GP": "GP",
    "FR-MF": "MF",
    "FR-MQ": "MQ",
    "FR-NC": "NC",
    "FR-PF": "PF",
    "FR-PM": "PM",
    "FR-RE": "RE",
    "FR-TF": "TF",
    "FR-WF": "WF",
    "FR-YT": "YT",
    "NL-AW": "AW",
    "NL-CW": "CW",
    "NL-SX": "SX",
    "NO-21": "SJ",
    "NO-22": "SJ",
    "US-AS": "AS",
    "US-GU": "GU",
    "US-MP": "MP",
    "US-PR": "PR",
    "US-UM": "UM",
    "US-VI": "VI",
}

# Subdivision aliases representing the same territory under different
# countries (reference: territory.py:130-134).
SUBDIVISION_ALIASES: Dict[str, str] = {
    "NL-BQ1": "BQ-BO",
    "NL-BQ2": "BQ-SA",
    "NL-BQ3": "BQ-SE",
}

# Exceptionally-reserved (invalid) country codes -> the valid ISO code of
# the main country of the territory (reference: territory.py:136-144).
RESERVED_COUNTRY_CODES: Dict[str, str] = {
    "DG": "IO",
    "FX": "FR",
    "EA": "ES",
}

# Invalid country codes -> their real subdivision code
# (reference: territory.py:146-151).
COUNTRY_ALIAS_TO_SUBDIVISION: Dict[str, str] = {
    "AC": "SH-AC",
    "CP": "FR-CP",
    "IC": "ES-CN",
    "TA": "SH-TA",
}


def generate_reverse_mapping() -> Dict[str, Set[str]]:
    """Reverse index of the alias tables (reference: territory.py:154-175).

    ``SUBDIVISION_COUNTRIES`` is indexed target->aliases; the other four
    straight mappings are indexed alias->targets, mirroring the reference's
    asymmetric construction exactly.
    """
    mapping: Dict[str, Set[str]] = {}
    for alias_code, target_code in SUBDIVISION_COUNTRIES.items():
        mapping.setdefault(target_code, set()).add(alias_code)
    for straight in (
        RESERVED_COUNTRY_CODES,
        COUNTRY_ALIASES,
        SUBDIVISION_ALIASES,
        FOREIGN_TERRITORIES_MAPPING,
    ):
        for alias_code, target_code in straight.items():
            mapping.setdefault(alias_code, set()).add(target_code)
    return mapping


REVERSE_MAPPING: Dict[str, Set[str]] = generate_reverse_mapping()
