"""Deterministic transcript fixture synthesizer.

Replaces the reference's faker-driven ``random_address()``
(/root/reference/postal_address/address.py:578-603) with a fully seeded
generator (faker is unavailable and determinism is required — FIXTURES.md).

Produces the ``transcripts`` table of BASELINE.json's ``input_hint``::

    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

A seeded fraction of turns embeds exactly one address mention in fielded
form ``ADDR{line1=...; line2=...; postal=...; city=...; country=...;
subdiv=...}``.  Duplicate mentions of one entity vary by the reference's
equivalence transformations (alias country codes per
tests/test_address.py:559-721, whitespace noise :457-471, postal junk
:473-505, blank line swap :507-515) plus small line1/city typos to exercise
the similarity scorer.

Every value is a pure function of ``(seed, conv_idx)`` / ``(seed,
entity_idx)``, so generation can run distributed (mapInPandas over a range
of conv indices) and reproduces identically at any partitioning or scale.
"""
from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd

MENTION_RE = (
    r"ADDR\{line1=(?P<line1>[^;}]*); line2=(?P<line2>[^;}]*); "
    r"postal=(?P<postal>[^;}]*); city=(?P<city>[^;}]*); "
    r"country=(?P<country>[^;}]*); subdiv=(?P<subdiv>[^;}]*)\}"
)

# Territory coding variants: each family lists (country_code,
# subdivision_code) spellings that the reference normalizes to ONE
# (country, subdivision) pair — the match-equivalence classes of SURVEY §2.C.
# Strict-mode-conflicting combos (e.g. CP+FR-CP) are deliberately excluded.
_TERRITORY_FAMILIES: List[Dict] = [
    {  # reconciliation quadruple, tests/test_address.py:559-600
        "variants": [("GU", "US-GU"), ("US", "US-GU"), ("GU", None), (None, "US-GU")],
        "city_pool": ["Tamuning", "Hagatna", "Dededo"],
        "postal_prefix": "969",
    },
    {  # Clipperton family, tests/test_address.py:602-619
        "variants": [("CP", None), (None, "FR-CP")],
        "city_pool": ["Clipperton Island"],
        "postal_prefix": "XXX",
    },
    {  # UM-67 family, tests/test_address.py:630-653
        "variants": [("UM", "UM-67"), (None, "UM-67")],
        "city_pool": ["Johnston Atoll"],
        "postal_prefix": "XXX",
    },
    {  # Bonaire family, tests/test_address.py:655-696
        "variants": [("BQ", "BQ-BO"), (None, "BQ-BO")],
        "city_pool": ["Bonaire", "Kralendijk"],
        "postal_prefix": "XXX",
    },
    {  # Taiwan family, tests/test_address.py:698-721
        "variants": [("TW", "TW-TTT"), (None, "TW-TTT")],
        "city_pool": ["Taitung City"],
        "postal_prefix": "950",
    },
    {  # EC country aliases, territory.py:93-98
        "variants": [("GB", None), ("UK", None), ("gb", None)],
        "city_pool": ["London", "Bristol", "Manchester"],
        "postal_prefix": "EC1",
    },
    {
        "variants": [("GR", None), ("EL", None)],
        "city_pool": ["Athens", "Thessaloniki"],
        "postal_prefix": "105",
    },
    {  # Réunion subdivision-country family
        "variants": [("RE", "FR-RE"), (None, "FR-RE"), ("RE", None)],
        "city_pool": ["Saint-Denis"],
        "postal_prefix": "974",
    },
    {  # plain France + metropolitan hierarchy (also the HOT block)
        "variants": [("FR", "FR-75"), (None, "FR-75"), ("fr", "fR-75"), ("FX", "FR-75")],
        "city_pool": ["Paris"],
        "postal_prefix": "750",
    },
    {
        "variants": [("US", "US-CA"), (None, "US-CA"), ("us", "US-CA")],
        "city_pool": ["Mountain View", "Cupertino", "San Jose"],
        "postal_prefix": "940",
    },
    {
        "variants": [("DE", "DE-BE"), (None, "DE-BE"), ("de", "DE-BE")],
        "city_pool": ["Berlin"],
        "postal_prefix": "110",
    },
    {
        "variants": [("VN", "VN-HN"), (None, "VN-HN")],
        "city_pool": ["Ha Noi"],
        "postal_prefix": "100",
    },
]

# The hot family index (Paris) — a configurable share of entities lands
# here to create one pathological blocking key for skew-mitigation tests.
_HOT_FAMILY = 8

_STREETS = [
    "Rue de Rivoli", "Avenue Victor Hugo", "Boulevard Saint-Germain",
    "Main Street", "Oak Avenue", "Maple Drive", "King Edward Street",
    "Pale San Vitores Road", "Zhongshan Road", "Elm Street",
    "Cedar Lane", "Park Avenue", "Market Street", "High Street",
    "Station Road", "Church Lane", "Mill Road", "Bridge Street",
    "Victoria Road", "Green Lane",
]

_FILLER = [
    "Can you update the shipping record for this customer?",
    "The delivery failed yesterday, please retry.",
    "I checked the CRM and found the following entry.",
    "Customer called about their order status.",
    "Please verify this address before the next shipment.",
    "The warehouse flagged this destination as ambiguous.",
    "Here is the address on file.",
    "Confirming the updated contact details.",
]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = [None, "crm_lookup", "geo_validate", None, "order_search", None]

_EPOCH = datetime(2024, 1, 1, 0, 0, 0)


@dataclass
class MentionTruth:
    rec_id: str
    conv_id: str
    turn_idx: int
    entity_id: str
    family: int
    line1: Optional[str]
    line2: Optional[str]
    postal_code: Optional[str]
    city_name: Optional[str]
    country_code: Optional[str]
    subdivision_code: Optional[str]


def _entity_rng(seed: int, entity_idx: int) -> random.Random:
    return random.Random((seed * 1_000_003 + entity_idx) ^ 0x5EED)


def _conv_rng(seed: int, conv_idx: int) -> random.Random:
    return random.Random((seed * 7_000_033 + conv_idx) ^ 0xC0FFEE)


def entity_profile(seed: int, entity_idx: int, hot_share: float = 0.05) -> Dict:
    """Canonical ground-truth address of an entity, seeded by index."""
    rng = _entity_rng(seed, entity_idx)
    hot = rng.random() < hot_share
    if hot:
        family_idx = _HOT_FAMILY
    else:
        family_idx = rng.randrange(len(_TERRITORY_FAMILIES))
    fam = _TERRITORY_FAMILIES[family_idx]
    street = rng.choice(_STREETS)
    number = rng.randrange(1, 9999)
    postal_suffix = "".join(rng.choice("0123456789") for _ in range(2))
    # Hot entities all share ONE exact postal: with full-postal blocking
    # this is the deliberately hot blocking key (~hot_share of mentions)
    # that exercises the salted self-join; within it, entities are
    # discriminated by line1 / primary number only.
    postal = "75001" if hot else fam["postal_prefix"] + postal_suffix
    return {
        "entity_id": f"E{entity_idx:08d}",
        "family": family_idx,
        "line1": f"{number} {street}",
        "line2": rng.choice([None, "Apt " + str(rng.randrange(1, 99)), None, None]),
        "postal_code": postal,
        "city_name": rng.choice(fam["city_pool"]),
        "variants": fam["variants"],
    }


def _noisy(rng: random.Random, value: Optional[str]) -> Optional[str]:
    """Whitespace noise the normalizer must erase (address.py:337-341)."""
    if value is None or rng.random() < 0.6:
        return value
    pads = [" ", "  ", "   ", "\t"]
    out = rng.choice(pads) + value + rng.choice(pads)
    if rng.random() < 0.3:
        parts = out.split(" ")
        if len(parts) > 2:
            k = rng.randrange(1, len(parts) - 1)
            parts[k] = parts[k] + "  "
            out = " ".join(parts)
    return out


def _postal_junk(rng: random.Random, postal: str) -> str:
    """Postal junk the canonicalizer strips (address.py:326-335)."""
    choice = rng.random()
    if choice < 0.5:
        return postal
    if choice < 0.7:
        return "  " + postal + " -  "
    if choice < 0.85:
        return postal[:2] + "/" + postal[2:] + "*"
    return "--" + postal + "_"


def _typo(rng: random.Random, value: str) -> str:
    """One-character substitution in the word part of the value — never in
    a leading house number (the scorer's primary-number feature treats the
    leading digits as an exact-match field, as real postal linkage does)."""
    space = value.find(" ")
    start = max(2, space + 2)
    if len(value) < start + 3:
        return value
    pos = rng.randrange(start, len(value) - 1)
    ch = rng.choice("abcdefghijklmnopqrstuvwxyz")
    return value[:pos] + ch + value[pos + 1 :]


def mention_fields(
    seed: int,
    entity_idx: int,
    mention_no: int,
    typo_prob: float = 0.15,
    hot_share: float = 0.05,
    unit: Optional[int] = None,
) -> Dict[str, Optional[str]]:
    """Raw (pre-normalization) fields of one mention of an entity.

    ``unit`` (stress shape, scripts/stress_bench.py): a distinct sub-unit
    of entity ``entity_idx``'s building — line1 gains a " Unit NNNN"
    suffix and the truth entity becomes per-unit.  Thousands of units
    share one (postal, leading house number) refined block while every
    unit is a DISTINCT normalized value, so the block stays quadratic
    after both key refinement and the pipeline's value collapse — the
    shape the salted hot-block join exists for.
    """
    profile = entity_profile(seed, entity_idx, hot_share=hot_share)
    rng = random.Random(
        (seed * 11_000_111 + entity_idx * 131 + mention_no) ^ 0xA11CE
    )
    country, subdiv = profile["variants"][
        rng.randrange(len(profile["variants"]))
    ]
    line1: Optional[str] = profile["line1"]
    line2 = profile["line2"]
    city = profile["city_name"]
    if unit is not None:
        line1 = f"{line1} Unit {unit:04d}"
    if rng.random() < typo_prob:
        if rng.random() < 0.7:
            line1 = _typo(rng, line1)
        else:
            city = _typo(rng, city)
    postal = _postal_junk(rng, profile["postal_code"])
    # blank line swap exercise (address.py:348-350)
    if line2 is None and rng.random() < 0.1:
        line1, line2 = "", line1
    return {
        "line1": _noisy(rng, line1),
        "line2": _noisy(rng, line2),
        "postal_code": postal,
        "city_name": _noisy(rng, city),
        "country_code": country,
        "subdivision_code": subdiv,
        "entity_id": (
            profile["entity_id"] if unit is None
            else f"{profile['entity_id']}u{unit:04d}"
        ),
        "family": profile["family"],
    }


def _fmt(value: Optional[str]) -> str:
    if value is None:
        return ""
    return str(value).replace(";", ",").replace("}", ")").replace("\n", " ")


def format_mention(fields: Dict[str, Optional[str]]) -> str:
    return (
        "ADDR{"
        f"line1={_fmt(fields['line1'])}; "
        f"line2={_fmt(fields['line2'])}; "
        f"postal={_fmt(fields['postal_code'])}; "
        f"city={_fmt(fields['city_name'])}; "
        f"country={_fmt(fields['country_code'])}; "
        f"subdiv={_fmt(fields['subdivision_code'])}"
        "}"
    )


def synth_conversation(
    seed: int,
    conv_idx: int,
    n_entities: int,
    mention_prob: float = 0.3,
    typo_prob: float = 0.15,
    hot_share: float = 0.05,
    hot_entity_share: float = 0.0,
    hot_block_units: int = 0,
    hot_block_share: float = 0.0,
) -> Tuple[List[Dict], List[MentionTruth]]:
    """One conversation's turns + mention ground truth, deterministic.

    ``hot_share`` skews the BLOCKING key (many entities share one postal
    code — defused by recall-lossless key refinement).  ``hot_entity_share``
    skews the ENTITY distribution: that fraction of mentions all reference
    entity 0 (one "HQ address" dominating a support corpus), which survives
    refinement — every mention shares the refined (postal, house#) key —
    but is structurally collapsed by the pipeline's "score values, not
    mentions" dedup (pair volume tracks distinct noisy renders, not
    mention count).  ``hot_block_units``/``hot_block_share`` is the shape
    that survives BOTH defenses: that fraction of mentions reference a
    random distinct unit of entity 0's building — one refined
    (postal, house#) block holding thousands of DISTINCT normalized
    values, inherently quadratic in scoring work; this is what the salted
    hot-block join defends (scripts/stress_bench.py quantifies it).
    Defaults 0.0/0 leave the RNG call sequence — and therefore every
    existing deterministic fixture — byte-identical.
    """
    rng = _conv_rng(seed, conv_idx)
    conv_id = f"c{conv_idx:010d}"
    n_turns = rng.randrange(4, 13)
    base_ts = _EPOCH + timedelta(seconds=conv_idx * 97)
    turns: List[Dict] = []
    truths: List[MentionTruth] = []
    for turn_idx in range(n_turns):
        role = _ROLES[turn_idx % 2 if rng.random() < 0.8 else 2]
        tool = rng.choice(_TOOLS) if role == "tool" else None
        text = rng.choice(_FILLER)
        if rng.random() < mention_prob:
            unit: Optional[int] = None
            if hot_entity_share > 0.0 and rng.random() < hot_entity_share:
                entity_idx = 0
            elif hot_block_units > 0 and rng.random() < hot_block_share:
                entity_idx = 0
                unit = rng.randrange(hot_block_units)
            else:
                entity_idx = rng.randrange(n_entities)
            mention_no = rng.randrange(1_000_000)
            fields = mention_fields(
                seed, entity_idx, mention_no,
                typo_prob=typo_prob, hot_share=hot_share, unit=unit,
            )
            text = f"{text} {format_mention(fields)} {rng.choice(_FILLER)}"
            # Truth records what the transcript encoding carries: the
            # ADDR{...} format cannot distinguish '' from absent, so empty
            # strings canonicalize to None here (extractor parity).
            truths.append(
                MentionTruth(
                    rec_id=f"{conv_id}#{turn_idx}",
                    conv_id=conv_id,
                    turn_idx=turn_idx,
                    entity_id=fields["entity_id"],
                    family=fields["family"],
                    line1=fields["line1"] or None,
                    line2=fields["line2"] or None,
                    postal_code=fields["postal_code"] or None,
                    city_name=fields["city_name"] or None,
                    country_code=fields["country_code"] or None,
                    subdivision_code=fields["subdivision_code"] or None,
                )
            )
        turns.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": base_ts + timedelta(seconds=turn_idx * 13),
            }
        )
    return turns, truths


def synth_transcripts_pandas(
    seed: int,
    n_convs: int,
    n_entities: int,
    mention_prob: float = 0.3,
    typo_prob: float = 0.15,
    hot_share: float = 0.05,
    hot_entity_share: float = 0.0,
    hot_block_units: int = 0,
    hot_block_share: float = 0.0,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Driver-side synthesis (small scales / pytest)."""
    all_turns: List[Dict] = []
    all_truth: List[MentionTruth] = []
    for conv_idx in range(n_convs):
        turns, truths = synth_conversation(
            seed, conv_idx, n_entities,
            mention_prob=mention_prob, typo_prob=typo_prob, hot_share=hot_share,
            hot_entity_share=hot_entity_share,
            hot_block_units=hot_block_units, hot_block_share=hot_block_share,
        )
        all_turns.extend(turns)
        all_truth.extend(truths)
    transcripts = pd.DataFrame(all_turns)
    truth = pd.DataFrame([t.__dict__ for t in all_truth])
    return transcripts, truth


def synth_transcripts_spark(
    spark,
    seed: int,
    n_convs: int,
    n_entities: int,
    mention_prob: float = 0.3,
    typo_prob: float = 0.15,
    hot_share: float = 0.05,
    hot_entity_share: float = 0.0,
    hot_block_units: int = 0,
    hot_block_share: float = 0.0,
    partitions: Optional[int] = None,
):
    """Distributed synthesis: mapInPandas over a conv-index range.

    Each partition generates its conversations independently from the
    per-conv RNG, so the output is identical at any parallelism — this is
    what makes the N-vs-4N scaling benchmark apples-to-apples.
    """
    from pyspark.sql import functions as F  # noqa: N812
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[Dict] = []
            for conv_idx in pdf["id"]:
                turns, _ = synth_conversation(
                    seed, int(conv_idx), n_entities,
                    mention_prob=mention_prob, typo_prob=typo_prob,
                    hot_share=hot_share, hot_entity_share=hot_entity_share,
                    hot_block_units=hot_block_units,
                    hot_block_share=hot_block_share,
                )
                rows.extend(turns)
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            )

    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_convs, numPartitions=parts)
    return base.mapInPandas(gen, schema=schema).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
