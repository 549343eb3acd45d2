"""Routing networks: random permutations route correctly
(`test/routing_algorithms/test_routing_algorithms.cpp:65`)."""
import random

import pytest

from crypto3_zk_tpu.arithmetization.routing import (
    IntegerPermutation, apply_routing, as_waksman_route, benes_route)

rng = random.Random(0xBE)


@pytest.mark.parametrize("n", [2, 4, 8, 16, 32])
def test_benes_routes_random_permutations(n):
    for _ in range(10):
        pi = list(range(n))
        rng.shuffle(pi)
        net = benes_route(pi)
        out = apply_routing(net, list(range(n)))
        # output[pi[i]] == i
        assert all(out[pi[i]] == i for i in range(n))


@pytest.mark.parametrize("n", [2, 3, 5, 6, 7, 9, 12, 17, 33])
def test_as_waksman_routes_arbitrary_sizes(n):
    for _ in range(10):
        pi = list(range(n))
        rng.shuffle(pi)
        net = as_waksman_route(pi)
        out = apply_routing(net, list(range(n)))
        assert all(out[pi[i]] == i for i in range(n))


def test_integer_permutation():
    pi = IntegerPermutation([2, 0, 3, 1])
    assert pi.inverse().mapping == [1, 3, 0, 2]
    assert pi.compose(pi.inverse()).is_identity()
    with pytest.raises(AssertionError):
        IntegerPermutation([0, 0, 1])
