"""Vendored static reference data + territory code-space API.

See build.py for the derived maps the Spark layer broadcasts.
"""
from .build import (  # noqa: F401
    COUNTRY_ALIASES_OF,
    DEFAULT_SUBDIVISION,
    PARENTS_CODES,
    SUBDIV_COUNTRY,
    SUBDIV_METADATA,
    SUPPORTED_COUNTRY_CODES,
    SUPPORTED_SUBDIVISION_CODES,
    SUPPORTED_TERRITORY_CODES,
    country_aliases,
    country_from_subdivision,
    country_name,
    default_subdivision_code,
    normalize_territory_code,
    subdivision_metadata,
    subdivision_type_id,
    supported_country_codes,
    supported_subdivision_codes,
    supported_territory_codes,
    territory_attachment,
    territory_children_codes,
    territory_parents_codes,
    territory_parents_subdivisions,
)
from .iso3166_1 import COUNTRIES  # noqa: F401
from .iso3166_2 import SUBDIVISIONS, Subdivision  # noqa: F401
from .territory_tables import (  # noqa: F401
    COUNTRY_ALIASES,
    COUNTRY_ALIAS_TO_SUBDIVISION,
    FOREIGN_TERRITORIES_MAPPING,
    RESERVED_COUNTRY_CODES,
    REVERSE_MAPPING,
    SUBDIVISION_ALIASES,
    SUBDIVISION_COUNTRIES,
)
