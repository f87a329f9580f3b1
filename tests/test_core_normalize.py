"""Address lifecycle parity tests.

Ported from /root/reference/postal_address/tests/test_address.py (golden
strings, normalization / reconciliation / strict-conflict cases), against
the vectorized core's scalar shim.  These goldens define the labeled truth
the pipeline's pairwise F1 is measured on.  No Spark required.
"""
import textwrap

import pytest

from postal_address_spark.core import AddressRecord, InvalidAddressError


def addr(**kw):
    return AddressRecord(**kw)


class TestAddressIO:
    # reference: tests/test_address.py:22-34
    def test_default_values(self):
        a = addr(
            line1="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            country_code="FR",
        )
        assert a.line1 == "10, avenue des Champs Elysées"
        assert a.line2 is None
        assert a.postal_code == "75008"
        assert a.city_name == "Paris"
        assert a.country_code == "FR"
        assert a.subdivision_code is None

    # reference: tests/test_address.py:36-43
    def test_emptiness(self):
        a = addr()
        assert a.empty is True
        assert not a
        a.line1 = "10, avenue des Champs Elysées"
        assert a.empty is False
        assert a

    # reference: tests/test_address.py:80-102
    def test_field_deletion(self):
        a = addr(
            line1="1 Infinite Loop",
            postal_code="95014",
            city_name="Cupertino",
            subdivision_code="US-CA",
        )
        assert a["line1"] is not None
        assert a.line1 is not None
        del a["line1"]
        assert a["line1"] is None
        assert a.line1 is None
        # territory-metadata field deletion removes the key entirely
        assert a["state_name"] is not None
        assert a.state_name is not None
        del a["state_name"]
        with pytest.raises(KeyError):
            a["state_name"]
        with pytest.raises(AttributeError):
            a.state_name

    # reference: tests/test_address.py:104-133
    def test_dict_access(self):
        a = addr(
            line1="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            country_code="FR",
        )
        assert {
            "line1", "line2", "postal_code", "city_name",
            "country_code", "subdivision_code",
        } == set(a)
        assert len(a) == 6
        assert {
            "10, avenue des Champs Elysées", "75008", "Paris", "FR", None,
        } == set(a.values())
        assert {
            "line1": "10, avenue des Champs Elysées",
            "line2": None,
            "postal_code": "75008",
            "city_name": "Paris",
            "country_code": "FR",
            "subdivision_code": None,
        } == dict(a.items())
        for key in a:
            assert getattr(a, key) == a[key]

    # reference: tests/test_address.py:55-78 (setter paths)
    def test_mutation_type_checks(self):
        from decimal import Decimal

        a = addr(line1="x", postal_code="75008", city_name="Paris",
                 country_code="FR")
        with pytest.raises(KeyError):
            a["bad_field"] = "Blah blah blah"
        with pytest.raises(TypeError):
            a.line1 = Decimal()
        with pytest.raises(TypeError):
            a["line1"] = Decimal()
        with pytest.raises(TypeError):
            a[Decimal()]
        with pytest.raises(TypeError):
            a[Decimal()] = "Blah blah blah"

    def test_renormalize_after_mutation(self):
        """__setitem__ stores the raw value (reference semantics); an
        explicit normalize() re-runs the chain over the mutated fields."""
        a = addr(line1="x", postal_code="75008", city_name="Paris",
                 country_code="FR")
        a["country_code"] = "  fr "
        assert a.country_code == "  fr "  # raw until re-normalized
        a.normalize()
        assert a.country_code == "FR"

    # reference: tests/test_address.py:45-67
    def test_unknown_field(self):
        with pytest.raises(KeyError):
            addr(bad_field="Blah blah blah")

    def test_non_string_field_value(self):
        with pytest.raises(TypeError):
            addr(line1=42)

    # reference: tests/test_address.py:135-146
    def test_unicode_mess(self):
        a = addr(
            line1="ब ♎ 1F: ̹ƶώ㎂🐎🐙💊 ꧲⋉ ⦼ Ė꧵┵",
            line2="⫇⻛⋯ ǖ╶🐎🐙💊ᵞᚘ⎢ ⚗ ⑆  ͋ụ 0 ⇚  � ῐ ",
            postal_code="3☾Ă⻛🐎🐙💊ȁ�ƈ₟Ǆ✒὘",
            city_name="Į🐎🐙💊❤Ệ▋",
            country_code="FR",
        )
        assert a.line1 is not None
        assert a.line2 is not None
        assert a.postal_code is not None
        assert a.city_name is not None

    # reference: tests/test_address.py:175-286 — golden rendered strings.
    def test_rendering_subdivision_less(self):
        a = addr(
            line1="BP 438",
            postal_code="75366",
            city_name="Paris CEDEX 08",
            country_code="FR",
        )
        assert a.render() == textwrap.dedent(
            """\
            BP 438
            75366 - Paris CEDEX 08
            France"""
        )

    def test_rendering_state(self):
        a = addr(
            line1="1600 Amphitheatre Parkway",
            postal_code="94043",
            city_name="Mountain View",
            subdivision_code="US-CA",
        )
        assert a.render() == textwrap.dedent(
            """\
            1600 Amphitheatre Parkway
            94043 - Mountain View, California
            United States"""
        )

    def test_rendering_city_state_dedup(self):
        a = addr(
            line1="Platz der Republik 1",
            postal_code="11011",
            city_name="Berlin",
            subdivision_code="DE-BE",
        )
        assert a.render() == textwrap.dedent(
            """\
            Platz der Republik 1
            11011 - Berlin
            Germany"""
        )

    def test_rendering_extra_subdivision_line(self):
        a = addr(
            line1="Dummy address",
            postal_code="F-12345",
            city_name="Dummy city",
            country_code="CP",
        )
        assert a.render() == textwrap.dedent(
            """\
            Dummy address
            F-12345 - Dummy city
            Clipperton
            France"""
        )

    def test_rendering_subdivision_country_dedup(self):
        a = addr(
            line1="Dummy address",
            postal_code="F-12345",
            city_name="Dummy city",
            country_code="RE",
            subdivision_code="FR-RE",
        )
        assert a.render() == textwrap.dedent(
            """\
            Dummy address
            F-12345 - Dummy city
            La Réunion
            Réunion"""
        )
        a = addr(
            line1="Dummy address",
            postal_code="F-12345",
            city_name="Dummy city",
            country_code="IC",
        )
        assert a.render() == textwrap.dedent(
            """\
            Dummy address
            F-12345 - Dummy city
            Canarias
            Spain"""
        )
        a = addr(
            line1="Dummy address",
            postal_code="F-12345",
            city_name="Dummy city",
            subdivision_code="ES-CN",
        )
        assert a.render() == textwrap.dedent(
            """\
            Dummy address
            F-12345 - Dummy city
            Canarias
            Spain"""
        )

    def test_rendering_subdivision_city_dedup(self):
        a = addr(
            line1="2 King Edward Street",
            postal_code="EC1A 1HQ",
            subdivision_code="GB-LND",
        )
        assert a.render() == textwrap.dedent(
            """\
            2 King Edward Street
            EC1A 1HQ - London, City of
            United Kingdom"""
        )


class TestAddressValidation:
    # reference: tests/test_address.py:297-383
    def test_address_validation(self):
        a = addr(
            line1="address_line1",
            line2="address_line2",
            postal_code="75000",
            city_name="Paris",
            country_code="US",
            subdivision_code=None,
        )
        assert a.valid is True

        a = addr(line1=None, postal_code=None, city_name=None, country_code=None)
        assert a.valid is False
        with pytest.raises(InvalidAddressError) as expt:
            a.validate()
        err = expt.value
        assert err.required_fields == {
            "line1", "postal_code", "city_name", "country_code",
        }
        assert err.invalid_fields == {}
        assert err.inconsistent_fields == set()
        assert "required" in str(err)
        assert "invalid" not in str(err)
        assert "inconsistent" not in str(err)

    # reference: tests/test_address.py:385-394
    def test_blank_string_normalization(self):
        a = addr(
            line1="10, avenue des Champs Elysées",
            line2="",
            postal_code="75008",
            city_name="Paris",
            country_code="FR",
            subdivision_code="",
        )
        assert a.line2 is None
        assert a.subdivision_code is None

    # reference: tests/test_address.py:397-455
    def test_invalid_code_normalization(self):
        a = addr(
            line1="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            subdivision_code="42",
        )
        assert a.country_code is None
        assert a.subdivision_code is None
        assert a.valid is False
        with pytest.raises(InvalidAddressError) as expt:
            a.validate()
        assert expt.value.required_fields == {"country_code"}
        assert expt.value.invalid_fields == {}
        assert expt.value.inconsistent_fields == set()

        a = addr(
            line1="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            country_code="MARS",
        )
        assert a.country_code is None
        assert a.subdivision_code is None
        assert a.valid is False

        a = addr(
            line1="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            country_code="MARS",
            subdivision_code="42",
        )
        assert a.country_code is None
        assert a.subdivision_code is None
        assert a.valid is False

    # reference: tests/test_address.py:457-471
    def test_space_normalization(self):
        a = addr(
            line1="   10, avenue    des \n   Champs Elysées   ",
            line2="    ",
            postal_code="   F     75008   ",
            city_name="   Paris   City    ",
            country_code=" fr          ",
            subdivision_code=" fR-75  ",
        )
        assert a.line1 == "10, avenue des Champs Elysées"
        assert a.line2 is None
        assert a.postal_code == "F 75008"
        assert a.city_name == "Paris City"
        assert a.country_code == "FR"
        assert a.subdivision_code == "FR-75"

    # reference: tests/test_address.py:473-505 — postal-code goldens.
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("   -  f-  - -  75008 -   ", "F-75008"),
            (
                "--   aAA 77b   -    - - --___--- sd-  fs - df"
                "sd--$^$^$^---fsf  -sd xd --",
                "AAA 77B-SD-FS-DFSD-FSF-SD XD",
            ),
            ("J/PPB1>6/_", "JPPB16"),
            (" * * * aAA 77b   -    -", "AAA 77B"),
        ],
    )
    def test_postal_code_normalization(self, raw, expected):
        a = addr(
            line1="10, avenue des Champs Elysées",
            postal_code=raw,
            city_name="Paris",
            country_code="FR",
        )
        assert a.postal_code == expected

    # reference: tests/test_address.py:507-515
    def test_blank_line_swap(self):
        a = addr(
            line1="",
            line2="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            country_code="FR",
        )
        assert a.line1 == "10, avenue des Champs Elysées"
        assert a.line2 is None

    # reference: tests/test_address.py:518-557 — strict-mode conflicts.
    def test_country_subdivision_validation(self):
        addr(
            line1="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            country_code="FR",
            subdivision_code="FR-75",
        )
        for bad_sub in ("BE-BRU", "US-GU"):
            with pytest.raises(InvalidAddressError) as expt:
                addr(
                    line1="10, avenue des Champs Elysées",
                    postal_code="75008",
                    city_name="Paris",
                    country_code="FR",
                    subdivision_code=bad_sub,
                )
            err = expt.value
            assert err.required_fields == set()
            assert err.invalid_fields == {}
            assert err.inconsistent_fields == {("country_code", "subdivision_code")}

    # reference: tests/test_address.py:559-600 — the reconciliation
    # quadruple: four differently-coded mentions of ONE entity.
    @pytest.mark.parametrize(
        "fields",
        [
            dict(country_code="GU", subdivision_code="US-GU"),
            dict(country_code="US", subdivision_code="US-GU"),
            dict(country_code="GU"),
            dict(subdivision_code="US-GU"),
        ],
    )
    def test_country_subdivision_reconciliation(self, fields):
        a = addr(
            line1="1273 Pale San Vitores Road",
            postal_code="96913",
            city_name="Tamuning",
            **fields,
        )
        assert a.line1 == "1273 Pale San Vitores Road"
        assert a.line2 is None
        assert a.postal_code == "96913"
        assert a.city_name == "Tamuning"
        assert a.country_code == "GU"
        assert a.subdivision_code == "US-GU"

    # reference: tests/test_address.py:602-721 — alias families.
    def test_country_alias_normalization(self):
        a = addr(
            line1="Barack 31",
            postal_code="XXX No postal code on this atoll",
            city_name="Clipperton Island",
            country_code="CP",
        )
        assert a.country_code == "FR"
        assert a.subdivision_code == "FR-CP"

        a = addr(
            line1="Barack 31",
            postal_code="XXX No postal code on this atoll",
            city_name="Clipperton Island",
            subdivision_code="FR-CP",
        )
        assert a.country_code == "FR"
        assert a.subdivision_code == "FR-CP"

        a = addr(
            line1="16 rue de Millo",
            postal_code="98000",
            city_name="La Condamine",
            subdivision_code="MC-CO",
        )
        assert a.country_code == "MC"
        assert a.subdivision_code == "MC-CO"

        for fields in (
            dict(country_code="UM", subdivision_code="UM-67"),
            dict(subdivision_code="UM-67"),
        ):
            a = addr(
                line1="Bunker building 746",
                postal_code="XXX No postal code on this atoll",
                city_name="Johnston Atoll",
                **fields,
            )
            assert a.country_code == "UM"
            assert a.subdivision_code == "UM-67"

        for fields in (
            dict(country_code="BQ", subdivision_code="BQ-BO"),
            dict(subdivision_code="BQ-BO"),
        ):
            a = addr(
                line1="Kaya Grandi 67",
                postal_code="XXX No postal code on Bonaire",
                city_name="Bonaire",
                **fields,
            )
            assert a.country_code == "BQ"
            assert a.subdivision_code == "BQ-BO"

        for fields in (
            dict(country_code="TW", subdivision_code="TW-TTT"),
            dict(subdivision_code="TW-TTT"),
        ):
            a = addr(
                line1="No.276, Zhongshan Rd.",
                postal_code="95001",
                city_name="Taitung City",
                **fields,
            )
            assert a.country_code == "TW"
            assert a.country_name == "Taiwan"
            assert a.subdivision_code == "TW-TTT"

    # reference: tests/test_address.py:723-749 — derived metadata fields.
    def test_subdivision_derived_fields(self):
        a = addr(
            line1="31, place du Théatre",
            postal_code="59000",
            city_name="Lille",
            subdivision_code="FR-59",
        )
        assert a.subdivision_code == "FR-59"
        assert a.subdivision_name == "Nord"
        assert a.subdivision_type_name == "Metropolitan department"
        assert a.subdivision_type_id == "metropolitan_department"
        assert a.metropolitan_department_area_code == "FR-59"
        assert a.metropolitan_department_name == "Nord"
        assert a.metropolitan_department_type_name == "Metropolitan department"
        assert a.metropolitan_region_area_code == "FR-HDF"
        assert a.metropolitan_region_name == "Hauts-de-France"
        assert a.metropolitan_region_type_name == "Metropolitan region"
        assert a.country_code == "FR"
        assert a.country_name == "France"

    # reference: tests/test_address.py:751-771
    @pytest.mark.parametrize("replace_city_name", [True, False])
    def test_subdivision_derived_city_fields(self, replace_city_name):
        a = AddressRecord(
            line1="2 King Edward Street",
            postal_code="EC1A 1HQ",
            subdivision_code="GB-LND",
            replace_city_name=replace_city_name,
        )
        assert a.subdivision_code == "GB-LND"
        assert a.subdivision_name == "London, City of"
        assert a.subdivision_type_name == "City corporation"
        assert a.subdivision_type_id == "city"
        assert a.city_area_code == "GB-LND"
        assert a.city_name == "London, City of"
        assert a.city_type_name == "City corporation"
        assert a.country_code == "GB"

    # reference: tests/test_address.py:773-790
    @pytest.mark.parametrize("replace_city_name", [True, False])
    def test_subdivision_derived_country(self, replace_city_name):
        a = AddressRecord(
            line1="Senate House",
            line2="Tyndall Avenue",
            postal_code="BS8 1TH",
            city_name="Bristol",
            subdivision_code="GB-BST",
            replace_city_name=replace_city_name,
        )
        assert a.subdivision_code == "GB-BST"
        assert a.subdivision_name == "Bristol, City of"
        assert a.subdivision_type_name == "Unitary authority"
        assert a.subdivision_type_id == "unitary_authority"
        assert a.country_code == "GB"

    # reference: tests/test_address.py:792-823
    def test_city_override_by_subdivision(self):
        addr(
            line1="2 King Edward Street",
            postal_code="EC1A 1HQ",
            city_name="London, City of",
            subdivision_code="GB-LND",
        )
        with pytest.raises(InvalidAddressError) as expt:
            addr(
                line1="2 King Edward Street",
                postal_code="EC1A 1HQ",
                city_name="Paris",
                subdivision_code="GB-LND",
            )
        err = expt.value
        assert err.required_fields == set()
        assert err.invalid_fields == {}
        assert err.inconsistent_fields == {("city_name", "subdivision_code")}

        a = AddressRecord(
            line1="2 King Edward Street",
            postal_code="EC1A 1HQ",
            city_name="Paris",
            subdivision_code="GB-LND",
            replace_city_name=False,
        )
        assert a.city_name == "Paris"

    # reference: tests/test_address.py:825-915 — non-strict overrides.
    def test_non_strict_mode_normalization(self):
        a = AddressRecord(
            strict=False,
            line1="2 King Edward Street",
            postal_code="EC1A 1HQ",
            city_name="Dummy city",
            subdivision_code="GB-LND",
        )
        assert a.city_name == "London, City of"
        assert a.country_code == "GB"
        assert a.subdivision_code == "GB-LND"

        a = AddressRecord(
            strict=False,
            line1="4 Bulevardul Nicolae Bålcescu",
            postal_code="010051",
            city_name="Dummy city",
            subdivision_code="RO-B",
        )
        assert a.city_name == "București"
        assert a.country_code == "RO"
        assert a.subdivision_code == "RO-B"

        a = AddressRecord(
            strict=False,
            line1="15 Ngô Quyền",
            postal_code="10000",
            city_name="Dummy city",
            subdivision_code="VN-HN",
        )
        assert a.city_name == "Hà Nội"
        assert a.country_code == "VN"
        assert a.subdivision_code == "VN-HN"

        a = AddressRecord(
            strict=False,
            line1="10, avenue des Champs Elysées",
            postal_code="75008",
            city_name="Paris",
            country_code="FR",
            subdivision_code="BE-BRU",
        )
        assert a.city_name == "Paris"
        assert a.country_code == "BE"
        assert a.subdivision_code == "BE-BRU"

        a = AddressRecord(
            strict=False,
            line1="Barack 31",
            postal_code="XXX No postal code",
            city_name="Clipperton Island",
            country_code="CP",
            subdivision_code="FR-CP",
        )
        assert a.postal_code == "XXX NO POSTAL CODE"
        assert a.city_name == "Clipperton Island"
        assert a.country_code == "FR"
        assert a.subdivision_code == "FR-CP"

        a = AddressRecord(
            strict=False,
            line1="9F., No. 290, Sec. 4, Zhongxiao E. Rd.",
            postal_code="10694",
            city_name="Dummy city",
            country_code="FR",
            subdivision_code="TW-TNN",
        )
        assert a.city_name == "Tainan"
        assert a.country_code == "TW"
        assert a.country_name == "Taiwan"
        assert a.subdivision_code == "TW-TNN"

    # reference: tests/test_address.py:917-943 — exhaustive domain sweep
    # (vendored domain; deterministic instead of faker-random).
    def test_all_country_codes(self):
        from postal_address_spark.refdata import (
            supported_country_codes,
            supported_subdivision_codes,
        )

        for country_code in sorted(supported_country_codes()):
            a = AddressRecord(
                line1="1 Main Street",
                postal_code="12345",
                city_name="Some City",
                country_code=country_code,
            )
            a.validate()
            a.render()

        for territory_code in sorted(supported_subdivision_codes()):
            a = AddressRecord(
                strict=False,
                line1="1 Main Street",
                postal_code="12345",
                city_name="Some City",
                subdivision_code=territory_code,
            )
            a.validate()
            a.render()
