"""Device hash map for integer block coordinates, TPU-native.

Reference: core/hashmap/HashMap.h:64 — Int32x3 keys -> value-buffer indices,
with Insert/Activate/Find/Erase over preallocated buffers; CUDA backends are
SlabHash/stdgpu (HashMap.h:27-58 documents the backend contract, including
non-dense buffer indices).

TPU design: the table is a single (capacity,) int32 array of PACKED keys in
HBM, managed with pure gather/scatter — no atomics, no pointers:

- 3D block coords are packed into one int32 (10 bits + offset 512 per axis,
  ~±47 m of scene at the default 9.3 cm block pitch — configurable);
- FIND is a vectorized linear-probe loop (fixed max probes, lax.fori_loop);
- ACTIVATE (insert-if-absent) resolves collisions with a scatter-min "claim"
  round instead of CAS: every pending key proposes itself for its probe slot,
  the minimum candidate id wins the slot, losers advance their probe offset.
  All lanes progress in lock-step rounds; max_rounds bounds the loop.

The slot index IS the value-buffer index (like the reference's buf_index),
so callers keep value arrays as (capacity, ...) tensors alongside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EMPTY = jnp.int32(-2147483648)  # sentinel for unoccupied slots / invalid keys

_COORD_BITS = 10
_COORD_OFF = 1 << (_COORD_BITS - 1)  # 512
_COORD_MASK = (1 << _COORD_BITS) - 1


def pack_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int32 block coords in [-512, 511] -> (N,) packed int32.
    Out-of-range coords are clamped (documented scene-extent limit)."""
    c = jnp.clip(coords + _COORD_OFF, 0, _COORD_MASK)
    return (c[..., 0] << (2 * _COORD_BITS)) | (c[..., 1] << _COORD_BITS) | c[..., 2]


def unpack_coords(packed: jnp.ndarray) -> jnp.ndarray:
    """(N,) packed int32 -> (N, 3) int32 block coords."""
    x = ((packed >> (2 * _COORD_BITS)) & _COORD_MASK) - _COORD_OFF
    y = ((packed >> _COORD_BITS) & _COORD_MASK) - _COORD_OFF
    z = (packed & _COORD_MASK) - _COORD_OFF
    return jnp.stack([x, y, z], axis=-1)


def _hash(x: jnp.ndarray) -> jnp.ndarray:
    """Finalizer-style integer mix (murmur3 fmix32 constants)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def find(table: jnp.ndarray, query: jnp.ndarray, max_probes: int = 32):
    """Look up packed keys. Returns (slot (N,) int32, found (N,) bool).
    slot is valid only where found. query == EMPTY rows return found=False.
    (ref: HashMap::Find, core/hashmap/HashMap.h:141)"""
    C = table.shape[0]
    h = (_hash(query) % jnp.uint32(C)).astype(jnp.int32)
    valid_q = query != EMPTY

    def body(p, carry):
        slot, found, dead = carry
        s = (h + p) % C
        cur = table[s]
        hit = (cur == query) & ~found & ~dead
        slot = jnp.where(hit, s, slot)
        found = found | hit
        dead = dead | (cur == EMPTY)  # empty slot ends the probe chain
        return slot, found, dead

    slot0 = jnp.full(query.shape, -1, jnp.int32)
    found0 = jnp.zeros(query.shape, bool)
    slot, found, _ = jax.lax.fori_loop(0, max_probes, body, (slot0, found0, ~valid_q))
    return slot, found & valid_q


def activate(table: jnp.ndarray, keys: jnp.ndarray, max_rounds: int = 64):
    """Insert-if-absent a batch of UNIQUE packed keys (duplicates within the
    batch must be removed first — see unique_packed). keys == EMPTY rows are
    ignored. Returns (new_table, slot (N,) int32, ok (N,) bool).
    (ref: HashMap::Activate, core/hashmap/HashMap.h:112)"""
    C = table.shape[0]
    N = keys.shape[0]
    h = (_hash(keys) % jnp.uint32(C)).astype(jnp.int32)
    ids = jnp.arange(N, dtype=jnp.int32)
    big = jnp.int32(N + 1)

    def body(_, carry):
        table, p, slot, done = carry
        s = (h + p) % C
        cur = table[s]
        # already present (pre-existing key or a winner from a prior round)
        hit = (cur == keys) & ~done
        slot = jnp.where(hit, s, slot)
        done = done | hit
        empty = (cur == EMPTY) & ~done
        # claim: lowest pending id wins each contested empty slot
        claim = jnp.full((C,), big, jnp.int32)
        claim = claim.at[jnp.where(empty, s, 0)].min(jnp.where(empty, ids, big))
        win = empty & (claim[s] == ids)
        table = table.at[jnp.where(win, s, C)].set(
            jnp.where(win, keys, EMPTY), mode="drop"
        )
        slot = jnp.where(win, s, slot)
        done = done | win
        # occupied by a different key (incl. slots lost this round next time)
        advance = ~done & (cur != EMPTY) & ~hit
        # losers of a claim stay at p: next round they see it occupied & advance
        p = p + advance.astype(jnp.int32)
        return table, p, slot, done

    p0 = jnp.zeros((N,), jnp.int32)
    slot0 = jnp.full((N,), -1, jnp.int32)
    done0 = keys == EMPTY
    table, _, slot, done = jax.lax.fori_loop(0, max_rounds, body, (table, p0, slot0, done0))
    ok = done & (keys != EMPTY)
    return table, slot, ok


def unique_packed(packed: jnp.ndarray, capacity: int):
    """Deduplicate packed keys (EMPTY = invalid) into a fixed-capacity array.
    Returns (unique (capacity,) int32 with EMPTY padding, count int32).
    Sort-based — the TPU-friendly replacement for hash-set dedup."""
    if packed.shape[0] < capacity:  # pad so the output slice is full-size
        packed = jnp.concatenate(
            [packed, jnp.full((capacity - packed.shape[0],), EMPTY, packed.dtype)]
        )
    s = jnp.sort(packed)
    # EMPTY (INT32_MIN) sorts first; drop it and duplicates
    first = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]]) & (s != EMPTY)
    count = jnp.sum(first.astype(jnp.int32))
    order = jnp.argsort(~first, stable=True)
    out = s[order[:capacity]]
    valid = jnp.arange(capacity) < count
    return jnp.where(valid, out, EMPTY), jnp.minimum(count, capacity)


def occupied_mask(table: jnp.ndarray) -> jnp.ndarray:
    return table != EMPTY
