"""Unit tests for the exact expand-by-counts / reduce-by-counts kernels."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from latentsplat_tpu.ops.rasterize.expand import (
    GW,
    OUT_BLOCK,
    block_offsets,
    expand_by_counts,
    reduce_by_counts,
    start_offsets,
)


def run_expand(rows, counts, budget, start_row):
    """Helper matching the old call shape: injects the starts/counts rows
    at start_row / start_row+1 (callers leave those rows zeroed)."""
    counts_j = jnp.asarray(counts)
    starts, _ = start_offsets(counts_j)
    rows_j = jnp.asarray(rows)
    rows_j = rows_j.at[start_row].set(starts)
    rows_j = rows_j.at[start_row + 1].set(counts_j.astype(jnp.float32))
    return expand_by_counts(
        rows_j, counts_j, budget, start_row, start_row + 1, interpret=True
    )


def expand_reference(rows, counts, pair_budget, start_row):
    """Numpy oracle: replicate column i into [start_i, start_i + counts_i)."""
    r_pad, g_pad = rows.shape
    out = np.zeros((r_pad, pair_budget), np.float32)
    pos = 0
    for i in range(g_pad):
        c = int(counts[i])
        lo = min(pos, pair_budget)
        hi = min(pos + c, pair_budget)
        if hi > lo:
            out[:, lo:hi] = rows[:, i : i + 1]
            out[start_row, lo:hi] = pos
            out[start_row + 1, lo:hi] = c
        pos += c
    return out


def reduce_reference(d_pairs, counts):
    r_pad, pair_budget = d_pairs.shape
    g_pad = counts.shape[0]
    out = np.zeros((r_pad, g_pad), np.float32)
    pos = 0
    for i in range(g_pad):
        c = int(counts[i])
        lo = min(pos, pair_budget)
        hi = min(pos + c, pair_budget)
        if hi > lo:
            out[:, i] = d_pairs[:, lo:hi].sum(axis=1)
        pos += c
    return out


def make_case(seed, g_pad, n_dead_tail=0, max_count=9):
    rng = np.random.default_rng(seed)
    counts = rng.integers(1, max_count + 1, size=g_pad).astype(np.int32)
    if n_dead_tail:
        counts[-n_dead_tail:] = 0
    r_pad = 16
    rows = rng.standard_normal((r_pad, g_pad)).astype(np.float32) * 100.0
    start_row = r_pad - 2
    rows[start_row:] = 0.0
    return rows, counts, start_row


def round_up(x, m):
    return ((x + m - 1) // m) * m


class TestBlockOffsets:
    def test_matches_cumsum(self):
        rng = np.random.default_rng(0)
        counts = rng.integers(0, 10, size=4 * GW).astype(np.int32)
        offs = np.asarray(block_offsets(jnp.asarray(counts)))
        expected = np.concatenate(
            [[0], np.cumsum(counts.reshape(4, GW).sum(axis=1))]
        )
        np.testing.assert_array_equal(offs, expected)


class TestExpand:
    @pytest.mark.parametrize("seed,g_blocks,dead", [(0, 1, 0), (1, 2, 5), (2, 3, 0)])
    def test_matches_reference(self, seed, g_blocks, dead):
        rows, counts, start_row = make_case(seed, g_blocks * GW, dead)
        budget = round_up(int(counts.sum()) + 64, OUT_BLOCK)
        got = np.asarray(run_expand(rows, counts, budget, start_row))
        want = expand_reference(rows, counts, budget, start_row)
        np.testing.assert_array_equal(got, want)

    def test_truncation(self):
        rows, counts, start_row = make_case(3, GW)
        budget = OUT_BLOCK  # far less than sum(counts)
        got = np.asarray(run_expand(rows, counts, budget, start_row))
        want = expand_reference(rows, counts, budget, start_row)
        np.testing.assert_array_equal(got, want)

    def test_exact_bits(self):
        """Interval-paint matmuls must move f32 values exactly."""
        rows, counts, start_row = make_case(4, GW)
        rows[:start_row] *= 1e-4  # exercise non-trivial mantissas
        rows[0, :] = np.pi
        budget = round_up(int(counts.sum()), OUT_BLOCK)
        got = np.asarray(run_expand(rows, counts, budget, start_row))
        want = expand_reference(rows, counts, budget, start_row)
        assert (got.view(np.uint32) == want.view(np.uint32)).all()


class TestReduce:
    @pytest.mark.parametrize("seed,g_blocks,dead", [(0, 1, 0), (1, 2, 7)])
    def test_matches_reference(self, seed, g_blocks, dead):
        _, counts, _ = make_case(seed, g_blocks * GW, dead)
        budget = round_up(int(counts.sum()) + 128, OUT_BLOCK)
        rng = np.random.default_rng(seed + 100)
        d_pairs = rng.standard_normal((16, budget)).astype(np.float32)
        got = np.asarray(
            reduce_by_counts(
                jnp.asarray(d_pairs), jnp.asarray(counts), 9, interpret=True
            )
        )
        want = reduce_reference(d_pairs, counts)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    def test_truncation_zero_grads(self):
        """Pairs beyond the budget must contribute no gradient."""
        _, counts, _ = make_case(5, GW)
        budget = OUT_BLOCK
        rng = np.random.default_rng(6)
        d_pairs = rng.standard_normal((16, budget)).astype(np.float32)
        got = np.asarray(
            reduce_by_counts(
                jnp.asarray(d_pairs), jnp.asarray(counts), 9, interpret=True
            )
        )
        want = reduce_reference(d_pairs, counts)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    def test_misaligned_dense_block_coverage(self):
        """Regression: a fully-dense block (all counts == max_count) whose
        pair span starts CHUNK-misaligned must still be fully covered by the
        adjoint's windows. With max_count=9, GW*max_count=1152 is not a
        multiple of CHUNK=256; floor-division window counts undercover the
        tail and silently zero its gradients."""
        max_count = 9
        counts = np.empty(2 * GW, np.int32)
        # Block 0 sums to 456 => the dense block starts at offset 456,
        # misaligned by 456 mod 256 = 200 > 256 - (1152 mod 256) = 128.
        counts[:72] = 4
        counts[72:GW] = 3
        assert counts[:GW].sum() == 456
        counts[GW:] = max_count  # dense block: spans the full GW*max_count
        budget = round_up(int(counts.sum()), OUT_BLOCK)
        rng = np.random.default_rng(11)
        d_pairs = rng.standard_normal((16, budget)).astype(np.float32)
        got = np.asarray(
            reduce_by_counts(
                jnp.asarray(d_pairs), jnp.asarray(counts), max_count,
                interpret=True,
            )
        )
        want = reduce_reference(d_pairs, counts)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    def test_adjoint_property(self):
        """<expand(rows), d> == <rows, reduce(d)> on the linear rows."""
        rows, counts, start_row = make_case(7, 2 * GW)
        budget = round_up(int(counts.sum()), OUT_BLOCK)
        rngs = np.random.default_rng(8)
        d_pairs = rngs.standard_normal((16, budget)).astype(np.float32)
        expanded = np.asarray(run_expand(rows, counts, budget, start_row))
        reduced = np.asarray(
            reduce_by_counts(
                jnp.asarray(d_pairs), jnp.asarray(counts), 9, interpret=True
            )
        )
        # Exclude the painted start row (an affine offset, not linear in rows).
        lin = [r for r in range(16) if r not in (start_row, start_row + 1)]
        lhs = float((expanded[lin] * d_pairs[lin]).sum())
        rhs = float((rows[lin] * reduced[lin]).sum())
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
