"""Direct unit/property tests for core/hashmap.py (SURVEY §5.2 duplicate-key
property tests; ref semantics: core/hashmap/HashMap.h:112-165)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.core import hashmap as hm


def _coords(n, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(lo, hi, size=(n, 3)), jnp.int32)


class TestPacking:
    def test_roundtrip_small(self):
        c = _coords(1000, -512, 512)
        assert jnp.array_equal(hm.unpack_coords(hm.pack_coords(c)), c)

    def test_roundtrip_wide_range(self):
        # far beyond the old ±512 clamp: scenes > 47 m must not alias
        c = _coords(1000, -(1 << 20), (1 << 20) - 1, seed=1)
        assert jnp.array_equal(hm.unpack_coords(hm.pack_coords(c)), c)

    def test_distinct_coords_distinct_keys(self):
        c = jnp.asarray(
            [[0, 0, 0], [513, 0, 0], [-513, 0, 0], [0, 100000, 0], [0, 0, -100000]],
            jnp.int32,
        )
        k = np.asarray(hm.pack_coords(c))
        assert len({tuple(r) for r in k}) == 5

    def test_out_of_range_clamps(self):
        c = jnp.asarray([[1 << 22, 0, 0]], jnp.int32)
        u = hm.unpack_coords(hm.pack_coords(c))
        assert int(u[0, 0]) == (1 << 20) - 1

    def test_packed_keys_always_valid(self):
        c = _coords(1000, -(1 << 21), 1 << 21, seed=2)
        assert bool(jnp.all(hm.is_valid(hm.pack_coords(c))))

    def test_empty_keys_invalid(self):
        assert not bool(jnp.any(hm.is_valid(hm.empty_keys(8))))


class TestFindActivate:
    def test_find_in_empty_table(self):
        t = hm.make_table(64)
        _, found = hm.find(t, hm.pack_coords(_coords(10, -5, 5)))
        assert not bool(jnp.any(found))

    def test_activate_then_find(self):
        t = hm.make_table(256)
        keys, n = hm.unique_keys(hm.pack_coords(_coords(100, -50, 50)), 128)
        t, slot, ok = hm.activate(t, keys)
        valid = np.asarray(jnp.arange(128) < n)
        assert bool(jnp.all(ok[valid]))
        s2, found = hm.find(t, keys)
        assert bool(jnp.all(found[valid]))
        assert np.array_equal(np.asarray(s2)[valid], np.asarray(slot)[valid])
        # stored keys match
        stored = np.asarray(t)[np.asarray(s2)[valid]]
        assert np.array_equal(stored, np.asarray(keys)[valid])

    def test_activate_idempotent(self):
        t = hm.make_table(256)
        keys = hm.pack_coords(_coords(64, -20, 20))
        keys, _ = hm.unique_keys(keys, 64)
        t1, slot1, ok1 = hm.activate(t, keys)
        t2, slot2, ok2 = hm.activate(t1, keys)
        assert jnp.array_equal(t1, t2)
        assert jnp.array_equal(slot1, slot2)
        assert jnp.array_equal(ok1, ok2)

    def test_duplicate_keys_within_batch_via_unique(self):
        # the documented contract: dedup first; unique_keys collapses dups
        c = jnp.concatenate([_coords(50, -4, 4, seed=3)] * 4)  # heavy dups
        keys, n = hm.unique_keys(hm.pack_coords(c), 200)
        kk = np.asarray(keys)[: int(n)]
        assert len({tuple(r) for r in kk}) == int(n)
        t = hm.make_table(512)
        t, slot, ok = hm.activate(t, keys)
        valid = np.asarray(jnp.arange(200) < n)
        # unique keys get unique slots
        s = np.asarray(slot)[valid]
        assert len(set(s.tolist())) == len(s)

    def test_collision_chains_high_load(self):
        # 120 keys into 128 slots: long probe chains must still resolve
        t = hm.make_table(128)
        keys, n = hm.unique_keys(hm.pack_coords(_coords(400, -100, 100, seed=4)), 120)
        t, slot, ok = hm.activate(t, keys, max_probes=128, max_rounds=128)
        valid = np.asarray(jnp.arange(120) < n)
        assert bool(jnp.all(ok[valid]))
        _, found = hm.find(t, keys, max_probes=128)
        assert bool(jnp.all(found[valid]))

    def test_capacity_full(self):
        t = hm.make_table(32)
        keys, n = hm.unique_keys(hm.pack_coords(_coords(64, -100, 100, seed=5)), 64)
        t, slot, ok = hm.activate(t, keys, max_probes=64, max_rounds=256)
        assert int(n) > 32
        n_ok = int(jnp.sum(ok.astype(jnp.int32)))
        assert n_ok == 32  # exactly capacity inserted, rest failed cleanly
        # table is full and every stored key is one of the requested ones
        assert int(jnp.sum(hm.occupied_mask(t).astype(jnp.int32))) == 32
        req = {tuple(r) for r in np.asarray(keys)[: int(n)]}
        for r in np.asarray(t):
            assert tuple(r) in req

    def test_find_misses_dont_false_positive(self):
        t = hm.make_table(256)
        ins, _ = hm.unique_keys(hm.pack_coords(_coords(64, 0, 50, seed=6)), 64)
        t, _, _ = hm.activate(t, ins)
        probe = hm.pack_coords(_coords(64, 100, 150, seed=7))  # disjoint range
        _, found = hm.find(t, probe)
        assert not bool(jnp.any(found))


class TestErase:
    def test_erase_then_miss(self):
        t = hm.make_table(128)
        keys, n = hm.unique_keys(hm.pack_coords(_coords(32, -10, 10)), 32)
        t, _, _ = hm.activate(t, keys)
        t, erased = hm.erase(t, keys[:16])
        assert bool(jnp.all(erased[np.asarray(jnp.arange(16) < jnp.minimum(n, 16))]))
        _, found = hm.find(t, keys)
        f = np.asarray(found)
        assert not f[:16].any()
        assert f[16 : int(n)].all()

    def test_probe_chain_survives_tombstone(self):
        # force a chain: tiny table, many keys; erase one in the middle and
        # verify keys past it are still findable and not re-duplicated
        t = hm.make_table(16)
        keys, n = hm.unique_keys(hm.pack_coords(_coords(14, -3, 3, seed=8)), 14)
        t, slot, ok = hm.activate(t, keys, max_probes=16, max_rounds=64)
        t, _ = hm.erase(t, keys[2:3])
        _, found = hm.find(t, keys, max_probes=16)
        f = np.asarray(found)[: int(n)]
        assert not f[2]
        assert f[[i for i in range(int(n)) if i != 2]].all()
        # re-activate the erased key: must reuse a free slot, others unmoved
        t2, slot2, ok2 = hm.activate(t, keys, max_probes=16, max_rounds=64)
        _, found2 = hm.find(t2, keys, max_probes=16)
        assert np.asarray(found2)[: int(n)].all()
        s_old, s_new = np.asarray(slot), np.asarray(slot2)
        keep = [i for i in range(int(n)) if i != 2]
        assert np.array_equal(s_old[keep], s_new[keep])


class TestUniqueKeys:
    def test_counts_and_padding(self):
        c = jnp.asarray([[1, 2, 3], [1, 2, 3], [4, 5, 6]], jnp.int32)
        keys, n = hm.unique_keys(hm.pack_coords(c), 8)
        assert int(n) == 2
        assert bool(jnp.all(~hm.is_valid(keys[2:])))

    def test_invalid_rows_dropped(self):
        k = jnp.concatenate([hm.pack_coords(_coords(10, -5, 5)), hm.empty_keys(10)])
        keys, n = hm.unique_keys(k, 32)
        kk = np.asarray(keys)[: int(n)]
        assert int(n) <= 10
        assert bool(jnp.all(hm.is_valid(keys[: int(n)])))

    def test_overflow_truncates_but_reports_true_count(self):
        # count is the PRE-clamp unique total so callers can DETECT the
        # truncation (advisor r2 #5); the array itself holds `capacity` keys.
        keys, n = hm.unique_keys(hm.pack_coords(_coords(100, -100, 100, seed=9)), 16)
        assert int(n) > 16  # overflow is visible
        assert bool(jnp.all(hm.is_valid(keys)))
        assert keys.shape == (16, 2)


class TestResizeActive:
    def test_active_slots(self):
        t = hm.make_table(64)
        keys, n = hm.unique_keys(hm.pack_coords(_coords(20, -8, 8)), 20)
        t, _, _ = hm.activate(t, keys)
        slots, cnt = hm.active_slots(t, 64)
        assert int(cnt) == int(n)
        got = {tuple(r) for r in np.asarray(t)[np.asarray(slots)[: int(cnt)]]}
        want = {tuple(r) for r in np.asarray(keys)[: int(n)]}
        assert got == want

    def test_resize_preserves_keys(self):
        t = hm.make_table(32)
        keys, n = hm.unique_keys(hm.pack_coords(_coords(20, -8, 8, seed=10)), 20)
        t, slot, _ = hm.activate(t, keys)
        t2, old_slots, new_slots, cnt = hm.resize(t, 128)
        assert int(cnt) == int(n)
        _, found = hm.find(t2, keys)
        assert bool(np.asarray(found)[: int(n)].all())
        # mapping is consistent: key at old slot is at the mapped new slot
        on, nn_ = np.asarray(old_slots), np.asarray(new_slots)
        told, tnew = np.asarray(t), np.asarray(t2)
        for i in range(int(cnt)):
            assert tuple(told[on[i]]) == tuple(tnew[nn_[i]])


@pytest.mark.parametrize("n,cap", [(200, 4096), (1000, 16384)])
def test_property_vs_python_dict(n, cap):
    """Randomized end-to-end: activate/find/erase sequence matches a dict.
    Load factor stays in the supported regime (≤ ~0.5 with default probe
    bounds; `ok` reports any key that could not be placed)."""
    rng = np.random.default_rng(42)
    t = hm.make_table(cap)
    model = {}
    for step in range(4):
        c = rng.integers(-2000, 2000, size=(n, 3)).astype(np.int32)
        keys, cnt = hm.unique_keys(hm.pack_coords(jnp.asarray(c)), n)
        t, slot, ok = hm.activate(t, keys)
        assert bool(jnp.all(ok[: int(cnt)]))
        kk, ss = np.asarray(keys), np.asarray(slot)
        for i in range(int(cnt)):
            model[tuple(kk[i])] = None
        # find everything inserted so far
        allk = jnp.asarray(np.array(sorted(model.keys()), np.int32).reshape(-1, 2))
        _, found = hm.find(t, allk)
        assert bool(jnp.all(found)), f"step {step}: missing keys"
        # erase a random subset
        if step == 2:
            drop = np.array(sorted(model.keys())[: n // 4], np.int32).reshape(-1, 2)
            t, er = hm.erase(t, jnp.asarray(drop))
            assert bool(jnp.all(er))
            for r in drop:
                del model[tuple(r)]
            _, f2 = hm.find(t, jnp.asarray(drop))
            assert not bool(jnp.any(f2))
