"""Exact XXH3-64 (kernel family K3 — the reference's headline hash).

Bit-exact implementation of the public XXH3 algorithm (xxHash v0.8), batched
over padded tokens on u32 lane pairs. The 192-byte default secret is the
public kSecret constant (verified byte-for-byte against the installed C
extension); seeded hashing derives the secret per the spec
(``secret64[2i] += seed; secret64[2i+1] -= seed``).

All four length paths (0-16, 17-128, 129-240, > 240 with 1024-byte blocks,
scrambles, and the overlapping last stripe) are evaluated branch-free over
the batch and selected by length — short-path work is negligible next to
the stripe loop, so the select costs little.

Layout: stripe-major words (shared with ``HashLayout``) plus a staged
*unaligned* last-64-byte window per token (the long path's final stripe and
every "input + len - k" read resolves into it with static offsets).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from stringwars_tpu.ops import wideint as w
from stringwars_tpu.ops.wideint import U64
from stringwars_tpu.tape import PaddedTokens

_U32 = jnp.uint32

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P32_1 = 2654435761
_P32_2 = 2246822519
_P32_3 = 3266489917

KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e"
)


def _secret_words(seed: int) -> np.ndarray:
    """Secret as LE u64 array [24], seed-derived per the spec."""
    base = np.frombuffer(KSECRET, "<u8").copy()
    if seed:
        s = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        base[0::2] += s
        base[1::2] -= s
    return base


def _sec64(secret: np.ndarray, byte_off: int) -> U64:
    """Secret u64 at a byte offset (may be unaligned)."""
    raw = secret.tobytes()
    val = int.from_bytes(raw[byte_off : byte_off + 8], "little")
    return U64.const(val)


def _avalanche_xxh64(h: U64) -> U64:
    h = w.xor(h, w.shr(h, 33))
    h = w.mul(h, U64.const(_P64_2))
    h = w.xor(h, w.shr(h, 29))
    h = w.mul(h, U64.const(_P64_3))
    h = w.xor(h, w.shr(h, 32))
    return h


def _avalanche_xxh3(h: U64) -> U64:
    h = w.xor(h, w.shr(h, 37))
    h = w.mul(h, U64.const(0x165667919E3779F9))
    h = w.xor(h, w.shr(h, 32))
    return h


def _rrmxmx(x: U64, length: jax.Array) -> U64:
    M = U64.const(0x9FB21C651E98DF25)
    x = w.xor(x, w.xor(w.rotl(x, 49), w.rotl(x, 24)))
    x = w.mul(x, M)
    x = w.xor(x, w.add(w.shr(x, 35), U64.from_u32(length)))
    x = w.mul(x, M)
    return w.xor(x, w.shr(x, 28))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class XXH3Layout:
    """Stripe-major words + unaligned last-64-byte window per token."""

    words_t: jax.Array  # uint32[W4, B]
    last64_t: jax.Array  # uint32[16, B]  (bytes [max(n-64, 0), ...) LE)
    lengths: jax.Array  # int32[B]

    def tree_flatten(self):
        return (self.words_t, self.last64_t, self.lengths), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.jit
def prepare3(tokens: PaddedTokens) -> XXH3Layout:
    """Stage the XXH3 layout (one transpose + one unaligned window gather)."""
    words = tokens.as_u32()  # [B, W4]
    n = tokens.lengths
    w4 = words.shape[1]
    # Window offset o maps to byte (n - 64 + o); for n < 64 the leading
    # region is virtually zero (negative word indices mask to 0), so every
    # "input + len - k" read lands at the fixed offset 64 - k.
    start = n - 64  # signed
    word0 = start >> 2  # arithmetic shift: floor division
    shift = ((start & 3) * 8).astype(_U32)
    idx = word0[:, None] + jnp.arange(17)[None, :]
    win = jnp.where(
        idx >= 0,
        jnp.take_along_axis(words, jnp.clip(idx, 0, w4 - 1), axis=1),
        0,
    )  # [B, 17] aligned words
    lo = win[:, :16] >> shift[:, None]
    hi = jnp.where(
        shift[:, None] > 0, win[:, 1:17] << (32 - jnp.maximum(shift[:, None], 1)), 0
    )
    last64 = lo | hi  # unaligned u32 view of bytes [start, start+64)
    return XXH3Layout(words_t=words.T, last64_t=last64.T, lengths=n)


def _row64(rows: jax.Array, word_idx: int) -> U64:
    """u64 from two consecutive u32 rows of a stripe-major matrix."""
    return U64(hi=rows[word_idx + 1], lo=rows[word_idx])


def _mix16(lo_words: U64, hi_words: U64, sec0: np.ndarray, sec_off: int, seed: int) -> U64:
    """XXH3_mix16B: the mid-size paths use the DEFAULT secret with the seed
    added/subtracted inline (only the long path uses the derived secret)."""
    s_lo = w.add(_sec64(sec0, sec_off), U64.const(seed))
    s_hi = w.sub(_sec64(sec0, sec_off + 8), U64.const(seed))
    return w.mul128_fold64(w.xor(lo_words, s_lo), w.xor(hi_words, s_hi))


def _bswap64(x: U64) -> U64:
    def bswap32(v):
        return (
            ((v & jnp.uint32(0xFF)) << 24)
            | ((v & jnp.uint32(0xFF00)) << 8)
            | ((v >> 8) & jnp.uint32(0xFF00))
            | (v >> 24)
        )

    return U64(hi=bswap32(x.lo), lo=bswap32(x.hi))


@functools.partial(jax.jit, static_argnames=("seed",))
def xxh3_64(layout: XXH3Layout, seed: int = 0) -> U64:
    """Exact XXH3-64 digest of every token -> U64 of uint32[B] pairs."""
    secret = _secret_words(seed)
    sec0 = _secret_words(0)  # short paths use the *default* secret + seed
    rows = layout.words_t
    last = layout.last64_t
    n = layout.lengths.astype(jnp.int32)
    n_u = n.astype(_U32)
    B = rows.shape[1]
    w4 = rows.shape[0]
    seed64 = U64.const(seed)

    def byte_at(pos):
        # Only the 1..3-byte path calls this: pos <= 2 lives in row 0.
        return (rows[0] >> ((pos & 3) * 8).astype(_U32)) & jnp.uint32(0xFF)

    def last64_u64(byte_off: int) -> U64:
        """u64 at bytes [n-64+byte_off, ...): static offset into the window."""
        k = byte_off // 4
        return U64(hi=last[k + 1], lo=last[k])

    # --- len 0 ---
    bitflip0 = w.xor(_sec64(sec0, 56), _sec64(sec0, 64))
    h_len0 = _avalanche_xxh64(w.xor(seed64, bitflip0))

    # --- len 1..3 ---
    c1 = byte_at(jnp.zeros_like(n))
    c2 = byte_at(n >> 1)
    c3 = byte_at(jnp.maximum(n - 1, 0))
    combined = (c1 << 16) | (c2 << 24) | c3 | (n_u << 8)
    s32 = np.frombuffer(KSECRET[:8], "<u4")
    bitflip13 = w.add(U64.from_u32(jnp.uint32(int(s32[0]) ^ int(s32[1]))), seed64)
    h_len13 = _avalanche_xxh64(w.xor(U64.from_u32(combined), bitflip13))

    # --- len 4..8 ---
    def bswap32v(v):
        return (
            ((v & jnp.uint32(0xFF)) << 24)
            | ((v & jnp.uint32(0xFF00)) << 8)
            | ((v >> 8) & jnp.uint32(0xFF00))
            | (v >> 24)
        )

    seed_lo = jnp.uint32(seed & 0xFFFFFFFF)
    s48 = U64(hi=bswap32v(jnp.broadcast_to(seed_lo, (B,))), lo=jnp.broadcast_to(seed_lo, (B,)))
    # s = seed ^ (bswap32(seed_lo) << 32): hi = bswap32(seed_lo) ^ seed_hi
    s48 = U64(hi=s48.hi ^ jnp.uint32((seed >> 32) & 0xFFFFFFFF), lo=s48.lo)
    input1 = rows[0]  # LE32(input)
    # LE32(input + len - 4): bytes [n-4, n) live in the last64 window at
    # byte offset 60.
    input2_lo = last[15]
    input64 = w.add(U64.from_u32(input2_lo), w.shl(U64.from_u32(input1), 32))
    bitflip48 = w.sub(w.xor(_sec64(sec0, 8), _sec64(sec0, 16)), s48)
    h_len48 = _rrmxmx(w.xor(input64, bitflip48), n_u)

    # --- len 9..16 ---
    bitflipl = w.add(w.xor(_sec64(sec0, 24), _sec64(sec0, 32)), seed64)
    bitfliph = w.sub(w.xor(_sec64(sec0, 40), _sec64(sec0, 48)), seed64)
    in_lo = w.xor(_row64(rows, 0), bitflipl)
    in_hi = w.xor(last64_u64(56), bitfliph)  # LE64(input + len - 8)
    acc916 = w.add_many(
        U64.from_u32(n_u), _bswap64(in_lo), in_hi, w.mul128_fold64(in_lo, in_hi)
    )
    h_len916 = _avalanche_xxh3(acc916)

    # --- len 17..128 ---
    def fwd64(byte_off: int) -> U64:
        k = byte_off // 4
        if k + 1 < w4:
            return _row64(rows, k)
        return U64.const(0)

    acc128 = w.mul(U64.from_u32(n_u), U64.const(_P64_1))
    # Pairs walk inward: (input+f, secret+sf) and (input+len-(f+16), secret+sf+16),
    # gated by len > g (spec: 96/64/32, innermost pair unconditional).
    for f, sf, g in ((48, 96, 96), (32, 64, 64), (16, 32, 32), (0, 0, 0)):
        mixf = _mix16(fwd64(f), fwd64(f + 8), sec0, sf, seed)
        mixb = _mix16(last64_u64(48 - f), last64_u64(56 - f), sec0, sf + 16, seed)
        pair = w.add(mixf, mixb)
        if g:
            acc128 = w.where(n > g, w.add(acc128, pair), acc128)
        else:
            acc128 = w.add(acc128, pair)
    h_len128 = _avalanche_xxh3(acc128)

    # --- len 129..240 ---
    acc240 = w.mul(U64.from_u32(n_u), U64.const(_P64_1))
    for i in range(8):
        acc240 = w.add(acc240, _mix16(fwd64(16 * i), fwd64(16 * i + 8), sec0, 16 * i, seed))
    acc240 = _avalanche_xxh3(acc240)
    nb_rounds = jnp.clip(n // 16, 8, 15)
    for i in range(8, 15):
        mixv = _mix16(fwd64(16 * i), fwd64(16 * i + 8), sec0, 16 * (i - 8) + 3, seed)
        acc240 = w.where(i < nb_rounds, w.add(acc240, mixv), acc240)
    acc240 = w.add(acc240, _mix16(last64_u64(48), last64_u64(56), sec0, 119, seed))
    h_len240 = _avalanche_xxh3(acc240)

    # --- long path (> 240) ---
    h_long = _xxh3_long(rows, last, n, secret)

    # Select by length.
    h = h_long
    h = w.where(n <= 240, h_len240, h)
    h = w.where(n <= 128, h_len128, h)
    h = w.where(n <= 16, h_len916, h)
    h = w.where(n <= 8, h_len48, h)
    h = w.where(n <= 3, h_len13, h)
    h = w.where(n == 0, _bc(h_len0, B), h)
    return h


def _bc(v: U64, B: int) -> U64:
    return U64(jnp.broadcast_to(v.hi, (B,)), jnp.broadcast_to(v.lo, (B,)))


def _mul32x32(data: U64, key: U64) -> U64:
    """(u32)(d^k) * ((d^k) >> 32) — the XXH3 accumulate multiply."""
    x = w.xor(data, key)
    return w.mul32_wide(x.lo, x.hi)


def _xxh3_long(rows: jax.Array, last: jax.Array, n: jax.Array, secret: np.ndarray) -> U64:
    """The > 240 path: 64-byte stripes, 16-stripe blocks, scrambles."""
    B = rows.shape[1]
    w4 = rows.shape[0]
    # Regular stripes before the overlapping last stripe: (n-1)//64
    # (16-stripe blocks fold in exactly because 1024 = 16 * 64).
    n_stripes_total = jnp.maximum((n - 1) // 64, 0)

    init_vals = (_P32_3, _P64_1, _P64_2, _P64_3, 0x85EBCA77C2B2AE63, _P32_2, 0x27D4EB2F165667C5, _P32_1)
    accs = [_bc(U64.const(v), B) for v in init_vals]

    sec64s = [_sec64(secret, 8 * k) for k in range(17)]
    scramble_sec = [_sec64(secret, 128 + 8 * i) for i in range(8)]

    max_stripes = max(w4 // 16, 1)  # 64B stripes available in the padded width

    def accumulate(accs, stripe_idx_static, sec_off_words, active):
        new = list(accs)
        for i in range(8):
            base = stripe_idx_static * 16 + 2 * i
            if base + 1 >= w4:
                data_val = U64.const(0)
            else:
                data_val = _row64(rows, base)
            key = _sec64(secret, 8 * sec_off_words + 8 * i)
            contrib_swap = data_val
            contrib_mul = _mul32x32(data_val, key)
            j = i ^ 1
            new[j] = w.where(active, w.add(new[j], contrib_swap), new[j])
            new[i] = w.where(active, w.add(new[i], contrib_mul), new[i])
        return new

    # Walk stripes; scramble every 16 stripes (block boundary).
    for s in range(max_stripes):
        active = s < n_stripes_total
        accs = accumulate(accs, s, s % 16, active)
        if (s + 1) % 16 == 0:
            boundary = (s + 1) <= n_stripes_total  # full block completed
            for i in range(8):
                scr = w.mul(
                    w.xor(w.xor(accs[i], w.shr(accs[i], 47)), scramble_sec[i]),
                    U64.const(_P32_1),
                )
                accs[i] = w.where(boundary, scr, accs[i])

    # Last stripe: bytes [n-64, n) with secret offset 192-64-7 = 121.
    for i in range(8):
        data_val = U64(hi=last[2 * i + 1], lo=last[2 * i])
        key = _sec64(secret, 121 + 8 * i)
        j = i ^ 1
        accs[j] = w.add(accs[j], data_val)
        accs[i] = w.add(accs[i], _mul32x32(data_val, key))

    # Merge.
    result = w.mul(U64.from_u32(n.astype(_U32)), U64.const(_P64_1))
    for i in range(4):
        lo_sec = _sec64(secret, 11 + 16 * i)
        hi_sec = _sec64(secret, 11 + 16 * i + 8)
        result = w.add(
            result, w.mul128_fold64(w.xor(accs[2 * i], lo_sec), w.xor(accs[2 * i + 1], hi_sec))
        )
    return _avalanche_xxh3(result)


def xxh3_hash(tokens: PaddedTokens, seed: int = 0) -> U64:
    """Convenience: stage + hash."""
    return xxh3_64(prepare3(tokens), seed)
