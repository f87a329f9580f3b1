"""Territory API parity tests.

Ported from /root/reference/postal_address/tests/test_territory.py (the
reference's own goldens), adapted to the vendored-refdata code space: the
pycountry full-domain sweeps become sweeps over the vendored tables.
No Spark required.
"""
import re

from postal_address_spark.refdata import (
    COUNTRIES,
    COUNTRY_ALIASES,
    FOREIGN_TERRITORIES_MAPPING,
    RESERVED_COUNTRY_CODES,
    SUBDIVISIONS,
    SUBDIVISION_COUNTRIES,
    country_aliases,
    country_from_subdivision,
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
)

import pytest


class TestTerritory:
    # reference: tests/test_territory.py:37-51
    def test_supported_territory_codes(self):
        assert "FR" in supported_territory_codes()
        assert "FR-59" in supported_territory_codes()
        assert "FRE" not in supported_territory_codes()

    def test_supported_country_codes(self):
        assert "FR" in supported_country_codes()
        assert "FX" in supported_country_codes()
        assert "UK" in supported_country_codes()
        assert "FR-59" not in supported_country_codes()

    def test_supported_subdivision_codes(self):
        assert "FR-59" in supported_subdivision_codes()
        assert "FR" not in supported_subdivision_codes()
        assert "UK" not in supported_subdivision_codes()

    # reference: tests/test_territory.py:53-55
    def test_territory_code_overlap(self):
        assert not set(COUNTRIES) & set(SUBDIVISIONS)

    # reference: tests/test_territory.py:57-82 (data-integrity sweeps)
    def test_foreign_territory_definition(self):
        for foreign, country in FOREIGN_TERRITORIES_MAPPING.items():
            assert foreign in COUNTRIES
            assert country in COUNTRIES

    def test_territory_exception_definition(self):
        for subdiv_code, alias_code in SUBDIVISION_COUNTRIES.items():
            assert subdiv_code in supported_subdivision_codes()
            assert alias_code in set(COUNTRIES) | set(SUBDIVISIONS)
        for country_code, alias_code in COUNTRY_ALIASES.items():
            assert country_code not in COUNTRIES
            assert alias_code in set(COUNTRIES) | set(SUBDIVISIONS)
        for country_code, alias_code in RESERVED_COUNTRY_CODES.items():
            assert country_code not in COUNTRIES
            assert alias_code in set(COUNTRIES) | set(SUBDIVISIONS)

    # reference: tests/test_territory.py:84-95
    def test_country_from_subdivision(self):
        for subdiv_code, target_code in SUBDIVISION_COUNTRIES.items():
            if len(target_code) != 2:
                target_code = SUBDIVISIONS[target_code].country_code
            assert country_from_subdivision(subdiv_code) == target_code
        for subdiv_code in set(SUBDIVISIONS) - set(SUBDIVISION_COUNTRIES):
            assert (
                country_from_subdivision(subdiv_code)
                == SUBDIVISIONS[subdiv_code].country_code
            )

    # reference: tests/test_territory.py:97-100
    def test_default_subdivision_code(self):
        assert default_subdivision_code("FR") is None
        assert default_subdivision_code("GU") == "US-GU"
        assert default_subdivision_code("SJ") is None

    # reference: tests/test_territory.py:102-117
    def test_territory_children_codes(self):
        assert territory_children_codes("GQ") == {
            "GQ-C", "GQ-I", "GQ-AN", "GQ-BN", "GQ-BS",
            "GQ-CS", "GQ-DJ", "GQ-KN", "GQ-LI", "GQ-WN",
        }
        assert territory_children_codes("GQ-I") == {"GQ-AN", "GQ-BN", "GQ-BS"}
        assert territory_children_codes("GQ-AN") == set()
        assert territory_children_codes("GQ-AN", include_self=True) == {"GQ-AN"}

    # reference: tests/test_territory.py:119-126
    def test_territory_parents_codes(self):
        assert list(territory_parents_codes("FR-59")) == ["FR-59", "FR-HDF", "FR"]
        assert list(territory_parents_codes("FR-59", include_country=False)) == [
            "FR-59", "FR-HDF",
        ]
        assert list(territory_parents_codes("FR")) == ["FR"]
        assert list(territory_parents_codes("FR", include_country=False)) == []

    # reference: tests/test_territory.py:128-146
    def test_alias_normalization(self):
        assert list(territory_parents_codes("DG")) == ["IO"]
        assert list(territory_parents_codes("SH-TA")) == ["SH-TA", "SH"]
        assert list(territory_parents_codes("TA")) == ["SH-TA", "SH"]
        assert list(territory_parents_codes("MQ")) == ["MQ"]
        assert list(territory_parents_codes("FR-MQ")) == ["MQ"]
        assert list(territory_parents_codes("BQ-SE")) == ["BQ-SE", "BQ"]
        assert list(territory_parents_codes("NL-BQ3")) == ["BQ-SE", "BQ"]

    # reference: tests/test_territory.py:148-178
    def test_country_aliases(self):
        assert country_aliases("UM-67") == {"US", "UM"}
        assert country_aliases("UM") == {"US", "UM"}
        assert country_aliases("US") == {"US"}
        assert country_aliases("BQ-BO") == {"NL", "BQ"}
        assert country_aliases("NL-BQ2") == {"NL", "BQ"}
        assert country_aliases("NO-21") == {"SJ", "NO"}
        assert country_aliases("DG") == {"DG", "IO", "GB"}
        assert country_aliases("IO") == {"IO", "GB"}
        assert country_aliases("FR") == {"FR"}
        assert country_aliases("FR-RE") == {"FR", "RE"}
        assert country_aliases("RE") == {"FR", "RE"}
        assert country_aliases("GB") == {"GB"}
        assert country_aliases("UK") == {"UK", "GB"}
        assert country_aliases("GR") == {"GR"}
        assert country_aliases("EL") == {"EL", "GR"}
        assert country_aliases("IM") == {"IM", "GB"}
        assert country_aliases("MC") == {"MC"}

    # reference: tests/test_territory.py:180-184 (over vendored domain)
    def test_subdivision_type_id_conversion(self):
        attribute_regexp = re.compile("[a-z][a-z0-9_]*$")
        for subdiv in SUBDIVISIONS.values():
            assert attribute_regexp.match(subdivision_type_id(subdiv))

    # reference: tests/test_territory.py:186-204
    def test_subdivision_type_id_city_classification(self):
        city_like = [
            "TM-S", "TW-CYI", "TW-TPE", "ES-ML", "GB-LND", "KP-01", "KP-13",
            "KR-11", "HU-HV", "LV-RIX", "ME-15", "NL-BQ1", "KH-12",
        ]
        for code in city_like:
            assert subdivision_type_id(SUBDIVISIONS[code]) == "city"

    # reference: tests/test_territory.py:206-230 (collision invariant)
    def test_subdivision_metadata_ids(self):
        base_fields = {
            "line1", "line2", "postal_code", "city_name",
            "country_code", "subdivision_code",
        }
        whitelist = {"city_name"}
        for subdiv in SUBDIVISIONS.values():
            if subdivision_type_id(subdiv) == "country":
                continue
            for metadata_id in subdivision_metadata(subdiv):
                if metadata_id not in whitelist:
                    assert metadata_id not in base_fields

    # reference: tests/test_territory.py:232-233
    def test_subdivision_parent_code(self):
        assert SUBDIVISIONS["CZ-205"].parent_code == "CZ-20"

    # reference: tests/test_territory.py:235-237
    def test_foreign_territory_mapping(self):
        assert territory_attachment("GP") == "FR"
        assert territory_attachment("BQ") == "NL"

    # reference: tests/test_territory.py:239-247
    def test_normalize_territory_code(self):
        assert normalize_territory_code("EL") == "GR"
        assert normalize_territory_code("FX") == "FR"
        assert normalize_territory_code("CN-TW") == "TW"
        assert normalize_territory_code("BQ") == "BQ"
        assert normalize_territory_code("FR-GP") == "GP"
        assert normalize_territory_code("NL-BQ1") == "BQ-BO"
        with pytest.raises(ValueError):
            normalize_territory_code("FRE")
        # strip + upper happens before the membership gate
        # (reference: tests/test_address.py:457-471 via territory.py:222)
        assert normalize_territory_code("  fr ") == "FR"

    # reference: tests/test_address.py:917-943 — the full-domain totality
    # sweep, vectorized: EVERY supported subdivision code and EVERY
    # supported country code normalizes, validates, and renders (the
    # round-1 gap was a 90-code curated subset; the vendored domain is now
    # the full iso-codes database, so this sweep covers ~5.4k codes in one
    # frame pass).
    def test_full_domain_normalize_validate_render_sweep(self):
        import pandas as pd

        from postal_address_spark.core.normalize import (
            normalize_frame,
            render_frame,
            validate_frame,
        )

        base = {
            "line1": "1 Test Street",
            "line2": None,
            "postal_code": "10000",
            "city_name": "Testville",
        }
        rows = [
            {**base, "country_code": None, "subdivision_code": code}
            for code in sorted(supported_subdivision_codes())
        ] + [
            {**base, "country_code": code, "subdivision_code": None}
            for code in sorted(supported_country_codes())
        ]
        frame = pd.DataFrame(rows, dtype=object)
        normalized = validate_frame(
            normalize_frame(frame, strict=False, replace_city_name=True)
        )
        rendered = render_frame(normalized)
        n_subs = len(supported_subdivision_codes())
        # every subdivision resolves its country (N7 totality)
        assert normalized["country_code"].iloc[:n_subs].notna().all()
        # every row renders to a non-empty block
        assert rendered.notna().all()
        assert (rendered.str.len() > 0).all()
        # every row passes validation in non-strict mode
        bad = normalized[~normalized["is_valid"].astype(bool)]
        assert bad.empty, bad[
            ["country_code", "subdivision_code", "invalid_fields"]
        ].head(10).to_string()

    # reference: tests/test_territory.py:249-261
    def test_normalize_territory_code_with_foreign_territory(self):
        assert normalize_territory_code("BQ", resolve_top_country=True) == "NL"
        assert normalize_territory_code("VI", resolve_top_country=True) == "US"
        assert normalize_territory_code("FR-GP", resolve_top_country=True) == "FR"
        assert normalize_territory_code("NL-BQ1", resolve_top_country=True) == "BQ-BO"
