"""Multi-scalar multiplication on TPU (the Groth16 prover's #1 hot loop).

Re-owns gnark-crypto's Pippenger MSM (reference [dep] go.mod:9; SURVEY.md §3.3
hot loop ①) with a formulation built for SIMD/XLA instead of goroutine
work-stealing:

  * Window digits (8-bit) for all 32 windows are extracted at once from the
    16-bit scalar limbs; per-window bucket accumulation is
    sort-by-digit -> segmented Hillis-Steele scan (batched over all windows)
    -> segment-tail scatter into (32, 256) bucket arrays.  Data-dependent
    scatter of *points* never happens — only index scatters of already-reduced
    segment sums, which XLA handles as a single scatter op.
  * The scan runs inside `lax.fori_loop` with a dynamic shift so the compiled
    graph contains ONE batched point-add regardless of N.
  * Bucket weighting uses the suffix-sum identity sum_j j*B_j = sum_j S_j
    (S = suffix sums), computed as log-depth batched tree passes.
  * Window combination is a Horner fori_loop (8 doublings + 1 add per step).
  * `msm_bits` is the specialized path for 0/1 scalars (the entire ChaCha
    witness — circuits/chachaV3 is fully bit-valued): a masked log-depth
    pairwise tree reduction, ~N point-adds total.

Scalars arrive as canonical (non-Montgomery) 16-bit limb arrays (N, 16);
points as affine Montgomery limbs (N, 2, L) with an infinity mask.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import jnp_curve as jc
from ..field.params import NLIMBS

WBITS = 8
NWINDOWS = 32  # 256 bits / 8
NBUCKETS = 1 << WBITS


def _one_mont(ops):
    return jnp.asarray(jc._one_cached(isinstance(ops, jc.Fp2Ops)))


def _coord_shape(ops):
    return (2, NLIMBS) if isinstance(ops, jc.Fp2Ops) else (NLIMBS,)


def _shift_right(arr, s, n, axis):
    """arr shifted by +s along `axis` (length n), zero-filled; s may be traced."""
    pad = jnp.zeros_like(arr)
    cat = jnp.concatenate([pad, arr], axis=axis)
    start = [0] * cat.ndim
    start[axis] = n - s
    sizes = list(cat.shape)
    sizes[axis] = n
    return jax.lax.dynamic_slice(cat, start, sizes)


def scalars_to_digits(scalar_limbs):
    """(N, 16) uint32 16-bit limbs -> (NWINDOWS, N) uint32 8-bit digits."""
    lo = scalar_limbs & 0xFF
    hi = (scalar_limbs >> 8) & 0xFF
    inter = jnp.stack([lo, hi], axis=-1).reshape(scalar_limbs.shape[0], 2 * NLIMBS)
    return inter.T  # (32, N)


def stage_prepare(points, inf_mask, scalar_limbs, ops=jc.G1):
    """Digits, sort, gather, Jacobian lift, segment heads."""
    n = points.shape[0]
    digits = scalars_to_digits(scalar_limbs)  # (32, N)
    order = jnp.argsort(digits, axis=1)  # (32, N)
    ds = jnp.take_along_axis(digits, order, axis=1)
    px = jnp.take(points[:, 0], order.reshape(-1), axis=0).reshape(
        (NWINDOWS, n) + _coord_shape(ops)
    )
    py = jnp.take(points[:, 1], order.reshape(-1), axis=0).reshape(
        (NWINDOWS, n) + _coord_shape(ops)
    )
    pinf = jnp.take(inf_mask, order.reshape(-1)).reshape(NWINDOWS, n)
    one = _one_mont(ops)
    zshape = (NWINDOWS, n) + _coord_shape(ops)
    Z = jnp.where(
        pinf.reshape(pinf.shape + (1,) * len(_coord_shape(ops))),
        jnp.zeros(zshape, jnp.uint32),
        jnp.broadcast_to(one, zshape),
    )
    heads = jnp.concatenate(
        [jnp.ones((NWINDOWS, 1), bool), ds[:, 1:] != ds[:, :-1]], axis=1
    )
    return ds, heads, px, py, Z


def stage_scan(ds, heads, px, py, Z, ops=jc.G1):
    """Segmented inclusive scan (Hillis-Steele), combine:
    (v1,f1) x (v2,f2) -> (f2 ? v2 : v1+v2, f1|f2)."""
    n = px.shape[1]
    logn = n.bit_length() - 1

    def body(k, carry):
        X, Y, Z, F = carry
        s = jnp.int32(1) << k
        Xs = _shift_right(X, s, n, 1)
        Ys = _shift_right(Y, s, n, 1)
        Zs = _shift_right(Z, s, n, 1)  # shifted-in Z=0 = infinity = identity
        Fs = _shift_right(F.astype(jnp.uint32), s, n, 1).astype(bool)
        ax, ay, az = jc.point_add(ops, (Xs, Ys, Zs), (X, Y, Z))
        X2 = ops.select(F, X, ax)
        Y2 = ops.select(F, Y, ay)
        Z2 = ops.select(F, Z, az)
        return X2, Y2, Z2, F | Fs

    X, Y, Z, _ = jax.lax.fori_loop(0, logn, body, (px, py, Z, heads))
    return X, Y, Z


def stage_buckets(ds, heads, X, Y, Z, ops=jc.G1):
    """Scatter segment tails into (32, 256) bucket arrays."""
    n = ds.shape[1]
    is_tail = jnp.concatenate([heads[:, 1:], jnp.ones((NWINDOWS, 1), bool)], axis=1)
    target = jnp.where(is_tail, ds, NBUCKETS)  # OOB rows are dropped by scatter
    bshape = (NWINDOWS, NBUCKETS) + _coord_shape(ops)
    widx = jnp.broadcast_to(jnp.arange(NWINDOWS)[:, None], (NWINDOWS, n))
    BX = jnp.zeros(bshape, jnp.uint32).at[widx, target].set(X, mode="drop")
    BY = jnp.zeros(bshape, jnp.uint32).at[widx, target].set(Y, mode="drop")
    BZ = jnp.zeros(bshape, jnp.uint32).at[widx, target].set(Z, mode="drop")
    return BX, BY, BZ


def stage_reduce(BX, BY, BZ, ops=jc.G1):
    """Weighted bucket reduction via the double-suffix identity:
    S_j = sum_{k>=j} B_k ; T_j = sum_{k>=j} S_k  =>  T_1 = sum_j j*B_j."""

    def _suffix(pts):
        def sbody(k, carry):
            X, Y, Z = carry
            s = jnp.int32(1) << k

            def shl(a):  # a[j] <- a[j+s], zero-filled (infinity) at the top
                pad = jnp.zeros_like(a)
                cat = jnp.concatenate([a, pad], axis=1)
                start = [0] * cat.ndim
                start[1] = s
                sizes = list(cat.shape)
                sizes[1] = NBUCKETS
                return jax.lax.dynamic_slice(cat, start, sizes)

            return jc.point_add(ops, (X, Y, Z), (shl(X), shl(Y), shl(Z)))

        return jax.lax.fori_loop(0, WBITS, sbody, pts)

    SX, SY, SZ = _suffix((BX, BY, BZ))
    TX, TY, TZ = _suffix((SX, SY, SZ))
    return TX[:, 1], TY[:, 1], TZ[:, 1]  # (32, coord): window sums


TREE_TAIL_WIDTH = 2048  # fixed-width fori takes over once a level is this small


def _merge_level(ops, fid, lid, first, last, B, live_pairs=None, nbuckets=NBUCKETS,
                 add_fn=None):
    """One merge-tree level: pair adjacent blocks, ONE point add per pair.

    fid/lid (W, m): first/last segment digit of each block; first/last:
    coord triples (W, m, coord) with the partial sums of those segments.
    B: bucket triple (W, NBUCKETS, coord) — completed segments are flushed
    into it with collision-free .set scatters (each bucket written once).
    live_pairs (W, m//2) bool or None: masks flushes of dead lanes (used by
    the fixed-width tail).  add_fn: the point add for the candidate merge
    (default complete jc.point_add; the fixed-base path substitutes the
    cheaper no-doubling kernels).  Returns halved state + updated buckets."""
    w, m = fid.shape
    half = m // 2
    cdim = first[0].ndim - 2

    def cexp(mask):
        return mask.reshape(mask.shape + (1,) * cdim)

    afid, alid = fid[:, 0::2], lid[:, 0::2]
    bfid, blid = fid[:, 1::2], lid[:, 1::2]
    aF = tuple(t[:, 0::2] for t in first)
    aL = tuple(t[:, 0::2] for t in last)
    bF = tuple(t[:, 1::2] for t in first)
    bL = tuple(t[:, 1::2] for t in last)

    join = alid == bfid
    a_single = afid == alid
    b_single = bfid == blid
    cand = (add_fn or jc.point_add)(ops, aL, bF)  # the one add per merge

    js = cexp(join & a_single)
    new_first = tuple(jnp.where(js, c, f) for c, f in zip(cand, aF))
    js2 = cexp(join & b_single)
    new_last = tuple(jnp.where(js2, c, l) for c, l in zip(cand, bL))

    live = jnp.ones((w, half), bool) if live_pairs is None else live_pairs
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, half))
    BX, BY, BZ = B
    # flush 1: interior joined segment (both blocks multi-segment)
    t1 = jnp.where(live & join & ~a_single & ~b_single, alid, nbuckets)
    # flush 2: A's completed rightmost segment (no join, A multi)
    t2 = jnp.where(live & ~join & ~a_single, alid, nbuckets)
    # flush 3: B's completed leftmost segment (no join, B multi)
    t3 = jnp.where(live & ~join & ~b_single, bfid, nbuckets)
    for t, v in ((t1, cand), (t2, aL), (t3, bF)):
        BX = BX.at[widx, t].set(v[0], mode="drop")
        BY = BY.at[widx, t].set(v[1], mode="drop")
        BZ = BZ.at[widx, t].set(v[2], mode="drop")
    return afid, blid, new_first, new_last, (BX, BY, BZ)


def stage_buckets_tree(ds, px, py, Z, ops=jc.G1, nbuckets=NBUCKETS,
                       tail=None, add_fn=None, add_fn_l1=None):
    """Work-efficient bucket accumulation: pairwise block merging.

    Replaces scan+tail-scatter (O(N log N) point adds) with a binary merge
    tree doing EXACTLY one candidate add per merge (N-1 adds total).  Each
    block tracks its leftmost/rightmost segment (id, partial-sum); a segment
    is flushed to its bucket the moment both boundaries are interior — so
    every bucket is written exactly once (collision-free .set scatter).

    Compile-time shape discipline (the round-1 version unrolled log2(N)
    distinct-shape point_add instances and was compile-prohibitive): the
    head levels carrying ~94% of the work unroll at true shapes down to
    TREE_TAIL_WIDTH; the remaining levels run inside ONE lax.fori_loop at
    fixed width with liveness-masked flushes — so the graph holds
    log2(N/TAIL)+1 point_add instances and total work stays ~1.1*N adds
    per window (vs N*log2(N) for the Hillis-Steele scan).

    ds (W, N) sorted digits; px/py/Z (W, N, coord) lifted Jacobian points.
    add_fn/add_fn_l1: candidate-add overrides (add_fn_l1 applies to the
    FIRST level only, where both operands are still affine-lifted Z in
    {0,1} — the fixed-base path runs the 6-mul affine kernel there; it is
    used only when the first level is in the unrolled head).
    Returns (BX, BY, BZ) with shape (W, NBUCKETS, coord)."""
    if tail is None:
        tail = TREE_TAIL_WIDTH
    w, n = ds.shape
    bshape = (w, nbuckets) + px.shape[2:]
    B = (
        jnp.zeros(bshape, jnp.uint32),
        jnp.zeros(bshape, jnp.uint32),
        jnp.zeros(bshape, jnp.uint32),
    )
    fid, lid = ds, ds
    first = (px, py, Z)
    last = (px, py, Z)

    # -------- unrolled head: true shapes while levels are wide
    m = n
    first_level = True
    while m > max(tail, 1):
        fn = add_fn_l1 if (first_level and add_fn_l1 is not None) else add_fn
        fid, lid, first, last, B = _merge_level(
            ops, fid, lid, first, last, B, nbuckets=nbuckets, add_fn=fn
        )
        m //= 2
        first_level = False

    # -------- fixed-width fori tail: log2(m) levels at width m
    if m > 1:
        logm = m.bit_length() - 1

        def pad_back(t, width):
            return jnp.concatenate(
                [t, jnp.zeros((w, width - t.shape[1]) + t.shape[2:], t.dtype)],
                axis=1,
            )

        def body(k, carry):
            fid, lid, first, last, B = carry
            h = m >> (k + 1)  # live pairs this level (traced)
            live = jax.lax.broadcasted_iota(jnp.int32, (w, m // 2), 1) < h
            # dead-lane fid/lid may alias real bucket ids; mask via `live`
            nfid, nlid, nfirst, nlast, B = _merge_level(
                ops, fid, lid, first, last, B, live_pairs=live,
                nbuckets=nbuckets, add_fn=add_fn
            )
            return (
                pad_back(nfid, m),
                pad_back(nlid, m),
                tuple(pad_back(t, m) for t in nfirst),
                tuple(pad_back(t, m) for t in nlast),
                B,
            )

        # sentinel dead-lane ids so garbage merges never flush real buckets
        fid, lid, first, last, B = jax.lax.fori_loop(
            0, logm, body, (fid, lid, first, last, B)
        )

    # final block: flush leftmost and rightmost (same value if one segment)
    widx = jnp.broadcast_to(jnp.arange(w)[:, None], (w, 1))
    BX, BY, BZ = B
    for t, v in ((fid[:, :1], first), (lid[:, :1], last)):
        BX = BX.at[widx, t].set(v[0][:, :1], mode="drop")
        BY = BY.at[widx, t].set(v[1][:, :1], mode="drop")
        BZ = BZ.at[widx, t].set(v[2][:, :1], mode="drop")
    return BX, BY, BZ


def msm(points, inf_mask, scalar_limbs, ops=jc.G1):
    """sum_i s_i * P_i as ONE traceable graph (for shard_map composition).
    points (N,2)+coord, inf_mask (N,), scalars (N,16) canonical limbs.
    Returns a single Jacobian point (X, Y, Z) in limb form."""
    n = points.shape[0]
    assert n & (n - 1) == 0, "pad N to a power of two"
    ds, heads, px, py, Z = stage_prepare(points, inf_mask, scalar_limbs, ops)
    X, Y, Z = stage_scan(ds, heads, px, py, Z, ops)
    B = stage_buckets(ds, heads, X, Y, Z, ops)
    W = stage_reduce(*B, ops)
    return combine_windows(ops, W)


def combine_windows_dev(ops, W):
    """Window Horner ON DEVICE: acc = ((W31*2^8 + W30)*2^8 + ...) — a fori
    over the 32 windows whose body unrolls the 8 doublings + 1 add.

    Why: the host combine costs ~30 device->host transfers; on a tunneled
    TPU that is ~900 ms of round trips (measured), and TPU while-loop
    iterations cost ~0.5 ms each, so the loop must iterate per WINDOW (32),
    not per bit (256).  Runtime ~20 ms, one transfer for the final point."""
    WX, WY, WZ = W

    def body(i, acc):
        w = NWINDOWS - 1 - i
        for _ in range(WBITS):
            acc = jc.point_double(ops, acc)
        pw = (
            jax.lax.dynamic_index_in_dim(WX, w, keepdims=False),
            jax.lax.dynamic_index_in_dim(WY, w, keepdims=False),
            jax.lax.dynamic_index_in_dim(WZ, w, keepdims=False),
        )
        return jc.point_add(ops, acc, pw)

    # seed with the TOP window (saves 8 doublings of infinity)
    acc = (WX[-1], WY[-1], WZ[-1])
    return jax.lax.fori_loop(1, NWINDOWS, body, acc)


def combine_windows_host(ops, W):
    """Window Horner on the HOST: kept for the CPU/test path (device->host
    transfers are free there; on the tunneled TPU use combine_windows_dev).
    Returns a Jacobian limb triple."""
    from ..curve import ref_ec as ec
    from ..field.params import FP, int_to_limbs

    is_g2 = isinstance(ops, jc.Fp2Ops)
    curve = ec.G2_CURVE if is_g2 else ec.G1_CURVE
    to_pt = jc.limbs_to_g2 if is_g2 else jc.limbs_to_g1
    WX, WY, WZ = [np.asarray(t) for t in W]
    pts = [to_pt((WX[w], WY[w], WZ[w])) for w in range(NWINDOWS)]
    acc = curve.infinity()
    for wdx in reversed(range(NWINDOWS)):
        for _ in range(WBITS):
            acc = curve.double(acc)
        acc = curve.add(acc, pts[wdx])

    def enc_fp(v):
        return int_to_limbs(FP.to_mont(v % FP.modulus)).astype(np.uint32)

    def enc(coord):
        if is_g2:
            return np.stack([enc_fp(coord.c0), enc_fp(coord.c1)])
        return enc_fp(coord)

    return enc(acc.x), enc(acc.y), enc(acc.z)


class StagedMSM:
    """Host-orchestrated MSM with separately-jitted stages: total compile time
    is the SUM of stage compiles instead of one superlinearly-slow module
    (XLA global passes dominate past ~10k ops)."""

    def __init__(self, ops=jc.G1):
        self.ops = ops
        self._prepare = jax.jit(functools.partial(stage_prepare, ops=ops))
        self._scan = jax.jit(functools.partial(stage_scan, ops=ops))
        self._buckets = jax.jit(functools.partial(stage_buckets, ops=ops))
        self._buckets_tree = jax.jit(functools.partial(stage_buckets_tree, ops=ops))
        self._reduce = jax.jit(functools.partial(stage_reduce, ops=ops))
        self._combine = jax.jit(functools.partial(combine_windows, ops))
        self._combine_dev = jax.jit(functools.partial(combine_windows_dev, ops))

    def batched(self, points, inf_mask, scalars_b):
        """Data-parallel MSMs: same point set, (B, N, 16) scalar batch ->
        Jacobian triple with a leading B axis.  Every stage vmapped; one
        dispatch chain regardless of B (the DP axis of SURVEY §2.3)."""
        if not hasattr(self, "_bjits"):
            ops = self.ops
            self._bjits = (
                jax.jit(
                    jax.vmap(
                        functools.partial(stage_prepare, ops=ops),
                        in_axes=(None, None, 0),
                    )
                ),
                jax.jit(
                    jax.vmap(lambda ds, px, py, Z: stage_buckets_tree(ds, px, py, Z, ops=ops))
                ),
                jax.jit(jax.vmap(functools.partial(stage_reduce, ops=ops))),
                jax.jit(jax.vmap(functools.partial(combine_windows_dev, ops))),
            )
        prep, tree, reduce_, comb = self._bjits
        ds, heads, px, py, Z = prep(points, inf_mask, scalars_b)
        B = tree(ds, px, py, Z)
        W = reduce_(*B)
        return comb(W)

    def __call__(self, points, inf_mask, scalar_limbs):
        n = points.shape[0]
        assert n & (n - 1) == 0, "pad N to a power of two"
        ds, heads, px, py, Z = self._prepare(points, inf_mask, scalar_limbs)
        # Default path: the work-efficient merge tree (~1.1*N point adds per
        # window vs N*log2(N) for the Hillis-Steele scan).  Its fixed-width
        # fori tail keeps the compile to log2(N/512)+1 point_add instances
        # (VERDICT.md round-1 weak #8: gate removed, scan is the opt-OUT).
        if os.environ.get("ZKTPU_MSM_SCAN", "0") == "1" or n < 1024:
            X, Y, Z = self._scan(ds, heads, px, py, Z)
            B = self._buckets(ds, heads, X, Y, Z)
        else:
            B = self._buckets_tree(ds, px, py, Z)
        W = self._reduce(*B)
        import jax as _jax

        if _jax.default_backend() == "tpu":
            # host combine costs ~30 device->host round trips (~900 ms over
            # the tunnel); on-device Horner is one transfer of one point
            return self._combine_dev(W)
        return combine_windows_host(self.ops, W)


def combine_windows(ops, W):
    """acc = sum_w 2^(8w) W_w via a 256-step bit loop (1 double + 1 masked
    add per fori body — the graph stays two point-ops regardless of width)."""
    WX, WY, WZ = W
    zero = (
        jnp.zeros(WX.shape[1:], jnp.uint32),
        jnp.zeros(WY.shape[1:], jnp.uint32),
        jnp.zeros(WZ.shape[1:], jnp.uint32),
    )

    def body(i, acc):
        bit = NWINDOWS * WBITS - 1 - i  # 255 .. 0
        acc = jc.point_double(ops, acc)
        w = bit // WBITS
        p = (WX[w], WY[w], WZ[w])
        added = jc.point_add(ops, acc, p)
        take = (bit % WBITS) == 0  # add W_w once, at its lowest bit position
        return jc.point_select(ops, jnp.logical_not(take), acc, added)

    return jax.lax.fori_loop(0, NWINDOWS * WBITS, body, zero)


def msm_bits(points, inf_mask, bits, ops=jc.G1):
    """sum over points where bit == 1 (witness MSMs for bit-valued circuits).

    points (N, 2, coord), inf_mask (N,), bits (N,) in {0,1}."""
    n = points.shape[0]
    assert n & (n - 1) == 0, "pad N to a power of two"
    one = _one_mont(ops)
    cshape = _coord_shape(ops)
    active = (bits != 0) & ~inf_mask
    zshape = (n,) + cshape
    X = points[:, 0]
    Y = points[:, 1]
    Z = jnp.where(
        active.reshape((n,) + (1,) * len(cshape)),
        jnp.broadcast_to(one, zshape),
        jnp.zeros(zshape, jnp.uint32),
    )
    # Phase 1 — fixed-width fold: reshape to (k, w) and fori-accumulate the k
    # rows.  ONE point_add instance in the graph regardless of N (the round-1
    # unrolled halving put log2(N/512) point_add instances at distinct shapes
    # in the graph and cost 197 s of XLA/Mosaic compile on the real chip).
    # Work stays ~N adds: (k-1) sequential width-w adds.
    w = int(os.environ.get("ZKTPU_MSM_FOLD_WIDTH", "2048"))
    w = min(n, w)
    if n > w:
        k = n // w
        Xr = X.reshape((k, w) + X.shape[1:])
        Yr = Y.reshape((k, w) + Y.shape[1:])
        Zr = Z.reshape((k, w) + Z.shape[1:])

        def fbody(i, acc):
            row = (
                jax.lax.dynamic_index_in_dim(Xr, i, keepdims=False),
                jax.lax.dynamic_index_in_dim(Yr, i, keepdims=False),
                jax.lax.dynamic_index_in_dim(Zr, i, keepdims=False),
            )
            return jc.point_add(ops, acc, row)

        X, Y, Z = jax.lax.fori_loop(1, k, fbody, (Xr[0], Yr[0], Zr[0]))
        n = w
    # Phase 2 — log-depth halving tree as a fori_loop over a fixed-width
    # buffer: at step k the live prefix has n >> k entries; masked lanes stay
    # at infinity.  (The second and last point_add instance in the graph.)
    logn = n.bit_length() - 1

    def body(k, carry):
        X, Y, Z = carry
        h = n >> (k + 1)  # traced

        def shl(a):
            pad = jnp.zeros_like(a)
            cat = jnp.concatenate([a, pad], axis=0)
            start = [0] * cat.ndim
            start[0] = h
            sizes = list(cat.shape)
            sizes[0] = n
            return jax.lax.dynamic_slice(cat, start, sizes)

        ax, ay, az = jc.point_add(ops, (X, Y, Z), (shl(X), shl(Y), shl(Z)))
        live = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < h
        mask = live.reshape((n,) + (1,) * len(cshape))
        return (
            jnp.where(mask, ax, jnp.zeros_like(ax)),
            jnp.where(mask, ay, jnp.zeros_like(ay)),
            jnp.where(mask, az, jnp.zeros_like(az)),
        )

    X, Y, Z = jax.lax.fori_loop(0, logn, body, (X, Y, Z))
    return X[0], Y[0], Z[0]


def msm_tern(points, inf_mask, zt, ops=jc.G1):
    """Signed-bit MSM for TERNARY witnesses: zt (N,) uint32 in {0,1,2}
    encoding scalars {0, +1, -1}.

    gnark's r1cs Xor emits intermediate wires a*(1-2b) in {-1,0,1}
    ([dep] go.mod:8; decoded from the reference r1cs by compat.gnark_r1cs),
    so witnesses solved from reference artifacts are ternary, not binary.
    A -1 scalar just negates the point's y coordinate (field neg maps the
    infinity slot's 0 to 0), so this costs ONE fused select pass over the
    query plus the ordinary msm_bits fold — not a second MSM."""
    y = points[:, 1]
    cdims = (1,) * (y.ndim - 1)
    neg = (zt == 2).reshape((-1,) + cdims)
    y2 = jnp.where(neg, ops.neg(y), y)
    pts = jnp.stack([points[:, 0], y2], axis=1)
    return msm_bits(pts, inf_mask, (zt != 0).astype(jnp.uint32), ops=ops)


# ------------------------------------------------- fixed-base MSM (H query)

FB_WBITS = 16
FB_NWINDOWS = 16  # 256 bits / 16
FB_NBUCKETS = 1 << FB_WBITS
# signed digits d in [-2^15, 2^15): buckets indexed by |d| in [0, 2^15];
# index 0 holds the dead zero-digit segments, 2^15 the single extreme bucket
FB_SIGNED_NBUCKETS = (1 << (FB_WBITS - 1)) + 1


def scalars_to_signed_digits(scalar_limbs):
    """(N, 16) canonical uint32 16-bit limbs -> (16, N) int32 signed digits
    in [-2^15, 2^15) with k = sum_w d_w 2^(16 w).

    Classic bias recode in ONE carry chain: m = k + 0x8000...8000 (2^15 in
    every window, 256-bit add via the packed-CLA _carry16 — ~14 wide ops),
    then d_w = m_w - 2^15.  Identity: k + sum_w 2^15 2^16w = sum_w m_w 2^16w
    with m_w in [0, 2^16)  =>  k = sum_w (m_w - 2^15) 2^16w.  The 16-round
    sequential borrow loop this replaces cost ~60 ms of tiny-op overhead on
    the chip (probe_r5c).  Top window absorbs its carry because Fr scalars
    are < 2^254 (top limb < 2^14); no carry-out ever leaves limb 15."""
    from ..field.jnp_field import field

    bias = jnp.uint32(1 << (FB_WBITS - 1))
    m, carry = field("fr")._carry16(scalar_limbs + bias)
    # carry-out is 0 for canonical Fr inputs; digits bias back to signed
    return (m.astype(jnp.int32) - jnp.int32(bias)).T  # (16, N)


def _axis_sum_tree(ops, T, axis, add_fn=None):
    """Halving-tree point sum along `axis` of a bucket triple.

    ONE point_add instance in the graph: a fori_loop with a traced
    half-width shift.  Lanes past the live width go stale but are never
    read (step k reads lanes < h_prev only), so no masking is needed."""
    add = add_fn or jc.point_add
    n = T[0].shape[axis]
    logn = n.bit_length() - 1

    def shl(a, s):
        pad = jnp.zeros_like(a)
        cat = jnp.concatenate([a, pad], axis=axis)
        start = [0] * cat.ndim
        start[axis] = s
        sizes = list(cat.shape)
        sizes[axis] = n
        return jax.lax.dynamic_slice(cat, start, sizes)

    def body(k, P):
        h = n >> (k + 1)
        return add(ops, P, tuple(shl(a, h) for a in P))

    T = jax.lax.fori_loop(0, logn, body, T)
    idx = [slice(None)] * T[0].ndim
    idx[axis] = 0
    return tuple(a[tuple(idx)] for a in T)


def _weighted_suffix(ops, T, n, add_fn=None):
    """sum_j j * T[j, ...] over a length-n (power of two) axis 0 via the
    double-suffix identity (stage_reduce's trick); each suffix scan is a
    fori_loop with a traced doubling shift — one point_add instance per
    scan."""
    add = add_fn or jc.point_add
    logn = n.bit_length() - 1

    def suffix(P):
        def shl(a, s):
            pad = jnp.zeros_like(a)
            cat = jnp.concatenate([a, pad], axis=0)
            return jax.lax.dynamic_slice_in_dim(cat, s, n, axis=0)

        def body(k, P):
            s = jnp.int32(1) << k
            return add(ops, P, tuple(shl(a, s) for a in P))

        return jax.lax.fori_loop(0, logn, body, P)

    S = suffix(T)
    U = suffix(S)
    return tuple(a[1] for a in U)


def _weighted_suffix_256(ops, T):
    return _weighted_suffix(ops, T, 256)


@functools.lru_cache(maxsize=None)
def _fb_jits(ops_key, tail, ops=None):
    """Shared jitted stages for FixedBaseMSM (see its __init__ note)."""
    return {
        "precompute": jax.jit(
            functools.partial(FixedBaseMSM._shift_copies, ops=ops)
        ),
        "prepare": jax.jit(
            functools.partial(FixedBaseMSM._prepare_impl, ops=ops)
        ),
        "tree": jax.jit(
            functools.partial(
                stage_buckets_tree, ops=ops, nbuckets=FB_SIGNED_NBUCKETS,
                tail=tail, add_fn=jc.point_add_nodbl,
                add_fn_l1=jc.point_madd_aff,
            )
        ),
        "reduce": jax.jit(functools.partial(FixedBaseMSM._reduce_hier_impl, ops=ops)),
        "normalize": jax.jit(functools.partial(FixedBaseMSM._normalize_affine, ops=ops)),
    }


class FixedBaseMSM:
    """MSM over a FIXED point set (the Groth16 H query — constant per
    proving key) with SIGNED 16-bit windows.

    The shifted copies Q[w, i] = 2^(16 w) * P_i are precomputed ON DEVICE
    once, so every per-proof window digit indexes its own pre-shifted point
    and all 16 windows fold into ONE flat bucket accumulation: ~16N
    merge-tree adds total versus 32N for the generic 8-bit Pippenger (plus
    a cheaper hierarchical bucket reduction and NO window Horner).  gnark's
    CPU analog is the c=13 signed-digit batch-affine MSM (BASELINE.md pgo
    analysis); this is the TPU-shaped counterpart — sort + segment-merge
    instead of data-dependent scatter.

    Round-5 (VERDICT r4 item 1) cost cuts, all multiplying into the ~16N
    merge adds that own two-thirds of the proof:
      * SIGNED digits d in [-2^15, 2^15): bucket = |d| (sign = a y-flip at
        gather time), so live buckets drop 65536 -> 32769 and the bucket
        reduction halves (the 256x128 hierarchical reshape + one 15-double
        tail for the single extreme bucket |d| = 2^15).
      * No-doubling adds: every tree/reduce add combines sums of DISJOINT
        non-empty subsets of CRS points (tau^i G and shift images), which
        can collide only via a linear relation among CRS powers — so the
        16-mul point_add_nodbl replaces the 23-mul complete add, and the
        FIRST tree level (half of all tree adds: both operands still
        affine) runs the 6-mul point_madd_aff.  REQUIRED CONTRACT: the
        point set must be pairwise distinct (infinity padding is fine —
        handled by selects); a duplicate pair landing in one bucket would
        silently produce infinity instead of the double.  Groth16 h_query
        = distinct powers of tau satisfies this unconditionally.
      * GLV analyzed, NOT adopted (VERDICT r4 named it): for a fixed-base
        MSM with precomputed window shifts the total digit count is
        invariant — splitting k into two 128-bit halves doubles the point
        set (phi-images) while halving windows per half, leaving
        windows*points = 16N unchanged; unlike variable-base Pippenger
        (where rounds = windows) there is no bucket-mass or add-count win,
        only 2x precompute HBM.  See BENCHMARKS.md.

    Bucket reduction: sum_j j*B_j over j = 128*hi + lo decomposes as
      128 * sum_hi hi*rowsum[hi] + sum_lo lo*colsum[lo]
    with row/col sums as log-depth halving trees over the (256, 128)
    reshape — ~65k adds (half the unsigned budget)."""

    def __init__(self, points, inf_mask, ops=jc.G1, tail=None):
        # tail: fori-tail takeover width for the merge tree.  Wider tail =
        # fewer unrolled head levels = cheaper Mosaic compile, at ~tail/2 *
        # log2(tail) masked extra adds (dead lanes).  None = module default.
        self.ops = ops
        n = points.shape[0]
        assert n & (n - 1) == 0, "pad N to a power of two"
        self.n = n
        # every jitted stage takes its device data as ARGUMENTS (no closure
        # over _Q), so the jit instances are shared per (ops, tail) across
        # FixedBaseMSM instances — a second Prover over a same-shape pk
        # (e.g. the gnark-artifact service next to the native one) reuses
        # the compiled graphs instead of re-tracing
        jits = _fb_jits(id(ops), tail, ops)
        self._precompute = jits["precompute"]
        self._prepare = jits["prepare"]
        self._tree = jits["tree"]
        self._reduce = jits["reduce"]
        QX, QY, QZ = self._precompute(jnp.asarray(points), jnp.asarray(inf_mask))
        cshape = _coord_shape(ops)
        # _Q = (X (16N,), Ycat (2*16N,) = [Y; -Y], Z (16N,)) affine-normalized
        self._Q = jits["normalize"](
            QX.reshape((FB_NWINDOWS * n,) + cshape),
            QY.reshape((FB_NWINDOWS * n,) + cshape),
            QZ.reshape((FB_NWINDOWS * n,) + cshape),
        )

    @staticmethod
    def _shift_copies(points, inf_mask, ops):
        """(N, 2, coord) affine + mask -> (16, N, coord) Jacobian triples of
        2^(16 w) * P_i (Z = 0 encodes infinity and survives doubling)."""
        n = points.shape[0]
        cshape = _coord_shape(ops)
        one = _one_mont(ops)
        X = points[:, 0]
        Y = points[:, 1]
        Z = jnp.where(
            inf_mask.reshape((n,) + (1,) * len(cshape)),
            jnp.zeros((n,) + cshape, jnp.uint32),
            jnp.broadcast_to(one, (n,) + cshape),
        )
        bufs = tuple(
            jnp.zeros((FB_NWINDOWS,) + t.shape, jnp.uint32).at[0].set(t)
            for t in (X, Y, Z)
        )

        def body(w, carry):
            bufs, P = carry
            for _ in range(FB_WBITS):
                P = jc.point_double(ops, P)
            bufs = tuple(b.at[w].set(c) for b, c in zip(bufs, P))
            return bufs, P

        bufs, _ = jax.lax.fori_loop(1, FB_NWINDOWS, body, (bufs, (X, Y, Z)))
        return bufs

    @staticmethod
    def _normalize_affine(QX, QY, QZ, ops):
        """Jacobian shift copies -> affine-with-Z in {0, 1-mont}.

        _shift_copies' doubling chain leaves windows 1..15 with arbitrary
        Jacobian Z, which would break the first tree level's affine-add
        specialization (ROUND-5 BUG found on-chip: the aff kernel assumed
        Z in {0,1}).  One Montgomery-trick batch inversion at precompute
        time (~3M muls, once per pk) restores the invariant: x = X/Z^2,
        y = Y/Z^3, Z = 1; infinity (Z = 0) inverts to 0 and keeps Z = 0."""
        F = jc.FP_OPS
        assert not isinstance(ops, jc.Fp2Ops), "H query is G1"
        zinv = F.batch_inv(QZ)
        zinv2 = F.mont_mul(zinv, zinv)
        zinv3 = F.mont_mul(zinv2, zinv)
        X = F.mont_mul(QX, zinv2)
        Y = F.mont_mul(QY, zinv3)
        inf = F.is_zero(QZ)
        one = jnp.asarray(jc._one_cached(False))
        Z = jnp.where(
            inf[..., None], jnp.zeros_like(QZ), jnp.broadcast_to(one, QZ.shape)
        )
        # store -Y alongside Y: the signed-digit y-flip then folds into the
        # prepare gather as an index offset (order + neg*16N) instead of a
        # full carry-chain negation pass per proof (probe_r5c: ~52 ms for
        # gather+neg; the neg leg is free this way for +32 MB of HBM)
        return X, jnp.concatenate([Y, F.neg(Y)], axis=0), Z

    @staticmethod
    def _prepare_impl(QX, QYcat, QZ, scalar_limbs, ops):
        """(N, 16) canonical 16-bit limbs -> signed-digit recode, then
        sorted flat |digit|/point arrays with the W=1 leading axis the
        merge tree expects.  The window-w digit pairs with Q[w*N + i];
        negative digits select the PRE-NEGATED y copy via an index offset
        into QYcat = [Y; -Y] (infinity's y = 0 negates to 0, so the mask
        layout survives)."""
        total = QX.shape[0]
        d = scalars_to_signed_digits(scalar_limbs)  # (16, N) int32
        d_flat = jnp.abs(d).astype(jnp.uint32).reshape(-1)  # (16N,)
        neg_flat = (d < 0).reshape(-1)
        order = jnp.argsort(d_flat)
        ds = jnp.take(d_flat, order)
        nf = jnp.take(neg_flat, order)
        px = jnp.take(QX, order, axis=0)
        py = jnp.take(QYcat, order + jnp.where(nf, total, 0), axis=0)
        pz = jnp.take(QZ, order, axis=0)
        return ds[None], px[None], py[None], pz[None]

    @staticmethod
    def _reduce_hier_impl(BX, BY, BZ, ops):
        """(1, 32769, coord) signed buckets -> sum_j j*B_j.

        Main block j in [0, 2^15): hierarchical (256, 128) reshape; the
        single extreme bucket j = 2^15 is 15 doublings + 1 add.  All
        interior adds combine disjoint bucket sets -> no-doubling kernel."""
        nodbl = jc.point_add_nodbl
        cshape = BX.shape[2:]
        main = tuple(
            t[:, : FB_SIGNED_NBUCKETS - 1].reshape((256, 128) + cshape)
            for t in (BX, BY, BZ)
        )
        ext = tuple(t[0, FB_SIGNED_NBUCKETS - 1] for t in (BX, BY, BZ))
        rows = _axis_sum_tree(ops, main, axis=1, add_fn=nodbl)  # (256,)
        cols = _axis_sum_tree(ops, main, axis=0, add_fn=nodbl)  # (128,)
        wr = _weighted_suffix(ops, rows, 256)  # sum_hi hi * rows[hi]
        wc = _weighted_suffix(ops, cols, 128)  # sum_lo lo * cols[lo]
        for _ in range(7):  # * 128
            wr = jc.point_double(ops, wr)
        acc = jc.point_add(ops, wr, wc)
        for _ in range(FB_WBITS - 1):  # extreme bucket * 2^15
            ext = jc.point_double(ops, ext)
        return jc.point_add(ops, acc, ext)

    def __call__(self, scalar_limbs):
        ds, px, py, pz = self._prepare(*self._Q, scalar_limbs)
        B = self._tree(ds, px, py, pz)
        return self._reduce(*B)


# ----------------------------------------------------------- host reference


def msm_reference(points_ref, scalars):
    """Slow Python oracle: sum_i s_i * P_i via ref_ec (tests only)."""
    from ..curve.ref_ec import G1_CURVE

    acc = G1_CURVE.infinity()
    for p, s in zip(points_ref, scalars):
        acc = G1_CURVE.add(acc, G1_CURVE.mul(p, s))
    return acc
