"""Hash-prefix routing of k-mers to owning shards via all_to_all.

New scope vs the reference (SURVEY.md §5.8): each of the D devices on the
``"d"`` mesh axis owns 1/D of the 64-bit hash space; every locally produced
canonical k-mer is routed to owner ``mix_hash(word) >> (64 - log2 D)``.

Ragged all_to_all is not expressible in XLA, so routing uses
**fixed-capacity buckets** (SURVEY.md §7 "hard parts"):

  1. owner id per lane (invalid lanes -> dead owner D, sorts last);
  2. stable sort lanes by owner;
  3. per-owner counts (histogram) + exclusive prefix = bucket extents;
  4. gather into a [D, capacity] send buffer (slack-sized; lanes beyond an
     owner's capacity are *counted* as overflow, never silently dropped);
  5. ``jax.lax.all_to_all`` over "d" -> [D, capacity] received lanes, all
     owned by this shard.

All steps are sort/gather/compare lane ops -- no scatter, no dynamic
shapes.  Overflow counters come back with the result; callers must surface
them (metrics counter ``route_overflow``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import u64 as u
from ..core.u64 import U64


class Routed(NamedTuple):
    """Result of routing: lanes now living on their owning shard."""

    words: U64            # [D * capacity] received k-mer words
    valid: jnp.ndarray    # [D * capacity] bool
    overflow: jnp.ndarray  # int32 scalar: lanes dropped on *this* sender


def owner_of(words: U64, n_shards: int, seed: int = 0) -> jnp.ndarray:
    """Owning shard = top bits of the mixer hash (hash-prefix routing).

    n_shards need not be a power of two: the prefix is mapped by
    multiply-shift ((hash_hi * D) >> 32), which preserves the
    range-partition property on the hash space.
    """
    h = u.mix_hash(words, seed)
    # 32-bit-only multiply-shift (Pallas/TPU-safe, no u64 multiply)
    return _mul_shift32(h.hi, n_shards)


def _mul_shift32(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """floor(x * d / 2**32) for uint32 x and small static d, using only
    32-bit lane ops (no u64 multiply)."""
    xl = x & u.u32(0xFFFF)
    xh = x >> 16
    # x*d = xh*d*2^16 + xl*d ; >> 32
    lo_prod = xl * u.u32(d)                    # < 2^48 -> fits? no: keep 32b
    hi_prod = xh * u.u32(d)
    # (hi_prod << 16 + lo_prod) >> 32 == (hi_prod + (lo_prod >> 16)) >> 16
    return ((hi_prod + (lo_prod >> 16)) >> 16).astype(jnp.int32)


def bucket_sort(words: U64, valid: jnp.ndarray, n_shards: int,
                seed: int = 0):
    """Sort lanes by owner (invalid last).  Returns (words, valid, owner)
    sorted, plus per-owner counts [n_shards]."""
    owner = jnp.where(valid, owner_of(words, n_shards, seed), n_shards)
    owner = owner.astype(jnp.int32)
    o, hi, lo, v = jax.lax.sort(
        (owner, words.hi, words.lo, valid), num_keys=1, is_stable=True)
    counts = jax.ops.segment_sum(
        jnp.ones_like(o), jnp.clip(o, 0, n_shards), num_segments=n_shards + 1
    )[:n_shards]
    return U64(hi, lo), v, o, counts


def build_send_buffer(words: U64, valid: jnp.ndarray, n_shards: int,
                      capacity: int, seed: int = 0):
    """[D, capacity] send buffer + per-destination valid mask + overflow."""
    sw, sv, so, counts = bucket_sort(words, valid, n_shards, seed)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]).astype(jnp.int32)
    n = sw.lo.shape[-1]
    j = jnp.arange(capacity, dtype=jnp.int32)[None, :]        # [1, C]
    src = starts[:, None] + j                                  # [D, C]
    in_bucket = j < jnp.minimum(counts, capacity)[:, None]     # [D, C]
    src_c = jnp.clip(src, 0, n - 1)
    send = U64(sw.hi[src_c], sw.lo[src_c])
    overflow = jnp.maximum(counts - capacity, 0).sum().astype(jnp.int32)
    return send, in_bucket, overflow


def route(words: U64, valid: jnp.ndarray, axis_name: str,
          capacity: int, seed: int = 0) -> Routed:
    """Inside shard_map: route local k-mers to their owning shard.

    words/valid: local lanes (any shape; flattened).
    capacity: per-destination lane budget on each sender.  Received size is
    D * capacity.
    """
    d = jax.lax.axis_size(axis_name)
    flat = U64(words.hi.reshape(-1), words.lo.reshape(-1))
    send, send_valid, overflow = build_send_buffer(
        flat, valid.reshape(-1), d, capacity, seed)
    recv_hi = jax.lax.all_to_all(send.hi, axis_name, 0, 0, tiled=True)
    recv_lo = jax.lax.all_to_all(send.lo, axis_name, 0, 0, tiled=True)
    recv_valid = jax.lax.all_to_all(send_valid, axis_name, 0, 0, tiled=True)
    return Routed(
        words=U64(recv_hi.reshape(-1), recv_lo.reshape(-1)),
        valid=recv_valid.reshape(-1),
        overflow=overflow,
    )


# -- multi-word (k <= 64) routing ---------------------------------------------

from ..core import u128 as u128mod          # noqa: E402
from ..core.u128 import U128                # noqa: E402


class RoutedWide(NamedTuple):
    words: U128
    valid: jnp.ndarray
    overflow: jnp.ndarray


def owner_of_wide(words: U128, n_shards: int, seed: int = 0) -> jnp.ndarray:
    h = u128mod.mix_hash(words, seed)
    return _mul_shift32(h.hi, n_shards)


def route_wide(words: U128, valid: jnp.ndarray, axis_name: str,
               capacity: int, seed: int = 0) -> RoutedWide:
    """Route 128-bit k-mer words to their owning shard (same fixed-capacity
    design as `route`, with a 4-lane payload)."""
    d = jax.lax.axis_size(axis_name)
    flat = U128(
        U64(words.hi.hi.reshape(-1), words.hi.lo.reshape(-1)),
        U64(words.lo.hi.reshape(-1), words.lo.lo.reshape(-1)))
    v = valid.reshape(-1)
    owner = jnp.where(v, owner_of_wide(flat, d, seed), d).astype(jnp.int32)
    o, hh, hl, lh, ll, sv = jax.lax.sort(
        (owner, flat.hi.hi, flat.hi.lo, flat.lo.hi, flat.lo.lo, v),
        num_keys=1, is_stable=True)
    counts = jax.ops.segment_sum(
        jnp.ones_like(o), jnp.clip(o, 0, d), num_segments=d + 1)[:d]
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]).astype(jnp.int32)
    n = ll.shape[-1]
    j = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    src = jnp.clip(starts[:, None] + j, 0, n - 1)
    in_bucket = j < jnp.minimum(counts, capacity)[:, None]
    overflow = jnp.maximum(counts - capacity, 0).sum().astype(jnp.int32)
    a2a = lambda x: jax.lax.all_to_all(x, axis_name, 0, 0, tiled=True)
    recv = [a2a(arr[src]) for arr in (hh, hl, lh, ll)]
    recv_valid = a2a(in_bucket)
    return RoutedWide(
        words=U128(U64(recv[0].reshape(-1), recv[1].reshape(-1)),
                   U64(recv[2].reshape(-1), recv[3].reshape(-1))),
        valid=recv_valid.reshape(-1),
        overflow=overflow,
    )


# -- round-trip query routing (distributed lookup) -----------------------------

def route_queries(words: U64, valid: jnp.ndarray, axis_name: str,
                  capacity: int, seed: int = 0):
    """Route query words to owners, keeping the return path.

    Returns (recv_words, recv_valid [D, C], reply(fn), overflow):
    the owner computes a [D, C] int32 answer array aligned with recv and
    calls reply(answers) -> answers delivered back and scattered to the
    ORIGINAL lane positions of this sender's queries (absent/overflowed
    lanes get -1).
    """
    d = jax.lax.axis_size(axis_name)
    n = words.lo.size
    flat = U64(words.hi.reshape(-1), words.lo.reshape(-1))
    v = valid.reshape(-1)
    owner = jnp.where(v, owner_of(flat, d, seed), d).astype(jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32)
    o, hi, lo, orig = jax.lax.sort((owner, flat.hi, flat.lo, pos),
                                   num_keys=1, is_stable=True)
    counts = jax.ops.segment_sum(
        jnp.ones_like(o), jnp.clip(o, 0, d), num_segments=d + 1)[:d]
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]).astype(jnp.int32)
    j = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    src = jnp.clip(starts[:, None] + j, 0, n - 1)          # [D, C]
    in_bucket = j < jnp.minimum(counts, capacity)[:, None]
    overflow = jnp.maximum(counts - capacity, 0).sum().astype(jnp.int32)
    a2a = lambda x: jax.lax.all_to_all(x, axis_name, 0, 0, tiled=True)
    recv = U64(a2a(hi[src]), a2a(lo[src]))
    recv_valid = a2a(in_bucket)
    send_orig = orig[src]                                   # [D, C] sender-side

    def reply(answers: jnp.ndarray) -> jnp.ndarray:
        """answers [D, C] int32 on the owner -> [n] at the original sender
        lane positions (-1 where unanswered)."""
        back = a2a(answers)                                 # [D, C] at sender
        out = jnp.full((n,), -1, dtype=jnp.int32)
        flat_pos = jnp.where(in_bucket, send_orig, n)       # n = drop slot
        out = jnp.zeros((n + 1,), jnp.int32).at[flat_pos.reshape(-1)].set(
            back.reshape(-1), mode="drop")[:n]
        answered = jnp.zeros((n + 1,), jnp.bool_).at[
            flat_pos.reshape(-1)].set(True, mode="drop")[:n]
        return jnp.where(answered, out, -1).reshape(words.lo.shape)

    return recv, recv_valid, reply, overflow
