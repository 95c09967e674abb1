"""The Lindley-reflection closed form used by events_sequence_match /
the scale path (n_pairs = #P - max(0, max_prefix(cumP - cumV))) must equal
the greedy one-pass automaton (pending counter) on EVERY sequence — the
differential gate proves it on fixture data; this pins the identity on
arbitrary event streams, including pathological all-purchase prefixes."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def greedy_pairs(seq: list[str]) -> int:
    pending = pairs = 0
    for ev in seq:
        if ev == "view":
            pending += 1
        elif ev == "purchase" and pending > 0:
            pending -= 1
            pairs += 1
    return pairs


def closed_form_pairs(seq: list[str]) -> int:
    cum_v = cum_p = 0
    max_exceed = 0
    for ev in seq:
        if ev == "view":
            cum_v += 1
        elif ev == "purchase":
            cum_p += 1
        max_exceed = max(max_exceed, cum_p - cum_v)
    return cum_p - max(0, max_exceed)


@settings(max_examples=500, deadline=None)
@given(
    st.lists(
        st.sampled_from(["view", "purchase", "signup", "click", "error"]),
        max_size=200,
    )
)
def test_closed_form_equals_greedy_automaton(seq):
    assert closed_form_pairs(seq) == greedy_pairs(seq)


def test_known_cases():
    assert greedy_pairs([]) == 0
    assert closed_form_pairs([]) == 0
    # P before any V never matches; V P P V P greedy-matches twice
    for seq, want in [
        (["purchase"], 0),
        (["purchase", "view", "purchase"], 1),
        (["view", "purchase", "purchase", "view", "purchase"], 2),
        (["view", "view", "purchase", "purchase"], 2),
    ]:
        assert greedy_pairs(seq) == want
        assert closed_form_pairs(seq) == want
