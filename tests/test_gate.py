"""The driver adjudicates the first 50 registry entries in iteration
order. These tests pin the DISCLOSED rotation policy (registry.py gate
comment): every operator family keeps a gated representative, the CDC
flagship pack is gated every round, everything rotated out this round
was adjudicated last round (so external adjudication covers the whole
registry within two consecutive rounds), and nothing falls off the
registry when modules are reordered."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from radiant_portal_pipeline_spark.operators.registry import (
    GATE_ORDER,
    GATE_ROWS_ONLY,
    REGISTRY,
    ROTATED_OUT_R5,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_is_exactly_fifty_first():
    names = list(entry.queries())
    assert names[:50] == GATE_ORDER
    assert len(names) == len(set(names))


def test_gate_covers_every_operator_family():
    """Registry edits that would evict a family from the gate fail CI
    (round-3 verdict #9)."""
    prefixes = {"cdc_", "t_", "s_", "m_", "st_", "q"}
    gated = set(GATE_ORDER)
    for p in prefixes:
        assert any(n.startswith(p) for n in gated), f"no {p}* query in the gate"


def test_cdc_flagship_pack_always_gated():
    """The tier's core semantics stay under external adjudication every
    round, rotation notwithstanding."""
    cdc = [n for n in REGISTRY if n.startswith("cdc_")]
    assert cdc and set(cdc) <= set(GATE_ORDER), set(cdc) - set(GATE_ORDER)


def test_gated_queries_oracle_backed_or_declared_rows_only():
    oracles = entry.oracle_sql()
    undeclared = [
        n for n in GATE_ORDER if n not in oracles and n not in GATE_ROWS_ONLY
    ]
    assert not undeclared, f"gated queries without an oracle: {undeclared}"
    stale = [n for n in GATE_ROWS_ONLY if n in oracles]
    assert not stale, f"declared rows-only but oracle exists: {stale}"


def test_rotation_covers_registry_within_two_rounds():
    """Everything cut from this round's gate must have been adjudicated
    last round — no query goes two consecutive rounds without external
    adjudication."""
    path = os.path.join(_REPO, "CORRECTNESS_r04.json")
    if not os.path.exists(path):
        return
    r4 = set(json.load(open(path)))
    tail = set(REGISTRY) - set(GATE_ORDER)
    assert set(ROTATED_OUT_R5) == tail, (
        "ROTATED_OUT_R5 out of sync with the actual tail"
    )
    not_recently = [n for n in tail if n not in r4]
    assert not not_recently, (
        f"cut from the gate AND not adjudicated last round: {not_recently}"
    )


def test_tail_queries_remain_registered():
    """Rotated-out shapes stay in queries() (inventory + a bigger
    future gate) — rotation must never delete an operator."""
    qs = entry.queries()
    for must_exist in ROTATED_OUT_R5:
        assert must_exist in qs
