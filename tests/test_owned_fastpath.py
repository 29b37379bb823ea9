"""Owned-input fast paths (merge_into_owned / combine_entities_data_owned /
schema_union_owned) must produce VALUES identical to the pure reference
functions on arbitrary nested structures — key order may differ for the
schema union (canonical_json normalizes), nothing else may."""

from __future__ import annotations

import copy

from hypothesis import given, settings
from hypothesis import strategies as st

from scrapontologies_spark.functions.semantics import (
    canonical_json,
    combine_entities_data,
    combine_entities_data_owned,
    merge_dicts_preferring_non_na,
    merge_into_owned,
    schema_union,
    schema_union_all,
    schema_union_owned,
)

# scalars include the NA sentinels (None / 'NA' / '') and falsy non-NA values
_scalar = st.one_of(
    st.none(),
    st.just("NA"),
    st.just(""),
    st.integers(-3, 3),
    st.sampled_from(["a", "b", "kind", "x y"]),
    st.booleans(),
)

_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from(list("pqrs")), children, max_size=3),
    ),
    max_leaves=12,
)

_payload = st.dictionaries(st.sampled_from(list("abcd")), _value, max_size=4)

_schema = st.recursive(
    st.fixed_dictionaries(
        {"type": st.sampled_from(["string", "integer", "number", "boolean"])}
    ),
    lambda children: st.one_of(
        st.fixed_dictionaries(
            {
                "type": st.just("object"),
                "properties": st.dictionaries(
                    st.sampled_from(list("wxyz")), children, max_size=3
                ),
            }
        ),
        st.fixed_dictionaries(
            {"type": st.just("array"), "items": children}
        ),
        st.fixed_dictionaries(
            {
                "type": st.just("object"),
                "properties": st.dictionaries(
                    st.sampled_from(list("wxyz")), children, max_size=2
                ),
                "required": st.lists(st.sampled_from(list("wxyz")), max_size=3),
            }
        ),
    ),
    max_leaves=10,
)


@settings(max_examples=300, deadline=None)
@given(_payload, _payload)
def test_merge_owned_equals_pure(a, b):
    pure = merge_dicts_preferring_non_na(a, b)
    owned = merge_into_owned(copy.deepcopy(a), copy.deepcopy(b))
    assert owned == pure


@settings(max_examples=150, deadline=None)
@given(st.lists(_payload, max_size=5))
def test_fold_owned_equals_pure(payloads):
    pure = combine_entities_data(payloads)
    owned = combine_entities_data_owned(copy.deepcopy(payloads))
    assert owned == pure


@settings(max_examples=300, deadline=None)
@given(_schema, _schema)
def test_schema_union_owned_equals_pure(s1, s2):
    pure = schema_union(s1, s2)
    owned = schema_union_owned(copy.deepcopy(s1), copy.deepcopy(s2))
    # key order may differ — canonical form may not
    assert canonical_json(owned) == canonical_json(pure)


@settings(max_examples=100, deadline=None)
@given(st.lists(_schema, max_size=5))
def test_schema_union_fold_owned_equals_pure(schemas):
    pure = schema_union_all(schemas)
    acc: dict = {}
    for s in copy.deepcopy(schemas):
        acc = schema_union_owned(acc, s)
    assert canonical_json(acc) == canonical_json(pure)


def test_owned_handles_empty_sides():
    assert merge_into_owned({}, {"a": 1}) == {"a": 1}
    assert merge_into_owned({"a": 1}, {}) == {"a": 1}
    assert schema_union_owned({}, {"type": "string"}) == {"type": "string"}
    assert schema_union_owned({"type": "string"}, {}) == {"type": "string"}
    assert schema_union_owned(None, None) == {}
