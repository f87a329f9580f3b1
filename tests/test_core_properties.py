"""Hypothesis property tests over the pure-Python scalar core — the
vectorized N1-N9/V1-V4/R1 chain (core/normalize.py) must be TOTAL
(errors are data: arbitrary str-or-None inputs never raise in
non-strict mode) and IDEMPOTENT (normalizing an already-normalized
frame changes nothing — the reference re-normalizes on every field
write, address.py:308-426, so a non-idempotent chain would drift).

These complement the ported reference goldens (exact outcomes) with
generated coverage of the input space no golden enumerates."""
import os
import sys

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postal_address_spark.core.normalize import (  # noqa: E402
    BASE_FIELD_IDS,
    normalize_frame,
    render_frame,
    validate_frame,
)

# printable-ish text including the separators/punctuation the chain
# manipulates, plus a biased pool of real-looking codes so the territory
# arms get exercised, not just the passthrough path
_text = st.one_of(
    st.none(),
    st.text(max_size=24),
    st.sampled_from(
        ["FR", "fr", "US-CA", "GU", "UK", "gb-lnd", "  ", "75013",
         "sw1a-1aa", "Nordkirchen", "10 rue du Soleil"]
    ),
)


def _frame(values):
    return pd.DataFrame([dict(zip(BASE_FIELD_IDS, values))], dtype=object)


@given(st.tuples(*[_text] * 6))
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_chain_is_total_and_idempotent(values):
    frame = _frame(values)
    once = normalize_frame(frame, strict=False)
    validated = validate_frame(once)
    rendered = render_frame(once)
    assert len(once) == len(validated) == len(rendered) == 1

    again = normalize_frame(
        once[list(BASE_FIELD_IDS)].copy(), strict=False
    )
    for f in BASE_FIELD_IDS:
        a, b = once[f].iloc[0], again[f].iloc[0]
        # the chain surfaces missing as either None or NaN depending on
        # the pandas op that produced the column — both are "null" here
        a_null = a is None or (not isinstance(a, str) and pd.isna(a))
        b_null = b is None or (not isinstance(b, str) and pd.isna(b))
        assert (a_null and b_null) or a == b, (f, a, b)
    # derived columns are a pure function of the (stable) base fields
    assert render_frame(again).iloc[0] == rendered.iloc[0]


@given(st.tuples(*[_text] * 6))
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_validate_errors_are_data(values):
    """validate_frame reports problems as columns, never exceptions, and
    its verdicts are consistent: an 'empty' record has every base field
    None; a 'valid' record has no invalid-code report."""
    out = validate_frame(normalize_frame(_frame(values), strict=False))
    row = out.iloc[0]
    if "empty" in out.columns and bool(row.get("empty")):
        norm = normalize_frame(_frame(values), strict=False)
        assert all(
            norm[f].iloc[0] is None or pd.isna(norm[f].iloc[0])
            for f in BASE_FIELD_IDS
        )
