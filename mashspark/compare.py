"""Sketch-pair comparison math — capped-merge Jaccard, Mash distance,
identity, binomial p-values. Pure numpy/math (no Spark); the Spark verify
UDF (``verify.py``) and golden tests both call in here.

Reference semantics reproduced exactly:

* capped sorted-merge intersect: ``compareSketches``
  (``src/mash/CommandDistance.cpp:336-385``) — two-pointer merge over both
  sorted unsigned hash lists, one merge step per distinct union element,
  stop at ``denom == sketch_size`` where
  ``sketch_size = min(s_ref, s_qry)`` (``CommandDistance.cpp:313-315``);
  if the merge exhausts early, top the denominator up with the leftovers
  and clamp to ``sketch_size``. Equivalent closed form used here: take the
  ``sketch_size`` smallest values of the union; ``common`` = how many of
  those occur in both lists; ``denom = min(sketch_size, |union|)``.
* Mash distance ``-ln(2j/(1+j))/k`` with j=0 -> 1, common==denom -> 0,
  clamp <= 1 (``CommandDistance.cpp:387-407``).
* containment ``|A∩B| / |B|`` with query-side-only denominator
  (``CommandContain.cpp:231-263``; compiled-out ``within`` command).
* identity ``jaccard ** (1/k)`` (``CommandScreen.cpp:463-482``).
* p-values: binomial survival function replacing GSL's
  ``gsl_cdf_binomial_Q(x-1, r, n)`` (``CommandDistance.cpp:427-448`` dist;
  ``CommandScreen.cpp:601-615`` screen). No scipy in this environment, so
  the tail sum is computed in log space with ``math.lgamma`` — matches the
  reference goldens to ~6 significant digits down to 1e-230.
"""

from __future__ import annotations

import math

import numpy as np


def capped_merge(a: np.ndarray, b: np.ndarray, sketch_size: int) -> tuple[int, int]:
    """(common, denom) of two sorted-ascending uint64 sketches.

    Closed form of the reference merge loop (see module docstring for the
    equivalence argument): each loop iteration consumes exactly one
    distinct union element in ascending order, so the first
    ``sketch_size`` iterations see the ``sketch_size`` smallest union
    values; ``common`` increments exactly on union values present in both.
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    union, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    denom = min(sketch_size, len(union))
    common = int(np.count_nonzero(counts[:denom] == 2))
    return common, denom


def capped_merge_sorted(a: np.ndarray, b: np.ndarray, sketch_size: int) -> tuple[int, int]:
    """``capped_merge`` specialized to already-sorted-distinct inputs
    (sketch blobs are stored sorted ascending): a stable sort of the
    concatenation detects the two pre-sorted runs (near-linear merge)
    and adjacent-equality flags replace ``np.unique``'s full
    sort+return_counts — same (common, denom), ~3x cheaper in the verify
    hot path. Equality with ``capped_merge`` is asserted by tests."""
    m = np.sort(np.concatenate([a, b]), kind="stable")
    if len(m) == 0:
        return 0, 0
    dup = m[1:] == m[:-1]            # second copy of a value present in both
    is_first = np.empty(len(m), dtype=bool)
    is_first[0] = True
    np.logical_not(dup, out=is_first[1:])
    shared_next = np.empty(len(m), dtype=bool)
    shared_next[:-1] = dup
    shared_next[-1] = False
    shared_flag = shared_next[is_first]  # per distinct union value, ascending
    denom = min(sketch_size, len(shared_flag))
    common = int(np.count_nonzero(shared_flag[:denom]))
    return common, denom


_PAD = np.iinfo(np.int64).max

# Per-worker scratch pool for the batch-merge hot path. Arrow batches
# arrive every few ms per python worker; a fresh ~32 MB np.full per batch
# means first-touch page faults inside the timed window, and on this
# sandbox's hypervisor anonymous-fault bandwidth drops to ~6 MiB/s during
# throttle episodes (measured; CPU burn probes stay healthy) — a fresh
# allocation then costs seconds while a reused buffer costs milliseconds.
# Workers are single-threaded per task, so a module-level pool is safe.
_SCRATCH: dict = {}


def _scratch(name: str, shape: tuple, dtype) -> np.ndarray:
    buf = _SCRATCH.get(name)
    need = int(np.prod(shape))
    if buf is None or buf.dtype != dtype or buf.size < need:
        buf = np.empty(max(need, 1), dtype=dtype)
        _SCRATCH[name] = buf
    return buf[:need].reshape(shape)


def capped_merge_sorted_batch(arrs_a: list, arrs_b: list, sketch_size: int):
    """Batch of capped merges over signed-encoded int64 sketch views
    (ordering-safe: signed ascending == unsigned ascending of the
    underlying hashes, see ``hashing.signed_sketch_bytes``).

    One 2-D stable sort over the whole Arrow batch replaces the per-pair
    Python loop: each pair's two sorted runs are laid into a row of a
    ``_PAD``-padded scratch matrix (timsort detects the two presorted
    runs — near-linear, ~16 us/row at s=1000 vs ~280 us for random data),
    then (common, denom) come from three slim column-axis passes:

    * ``dup[j] = mat[j+1] == mat[j]`` marks the second copy of a value
      present in both sketches (within-sketch values are distinct);
    * the value at dup cell ``j+1`` has distinct-union rank
      ``(j+2) - Dc[j]`` where ``Dc = cumsum(dup)`` (int32), so
      ``rank <= sketch_size`` is the single compare ``Dc[j] >= j+2-s`` —
      no rank matrix is ever materialized;
    * padding cells sort last, so their fake dup runs only shift ranks of
      later padding cells; they are excluded from common/denom by a
      ``!= _PAD`` value check.

    Rows containing the sentinel value itself (probability ~2**-64 per
    hash) fall back to the scalar path, so results are bit-identical to
    ``capped_merge_sorted``.

    Returns (common, denom) int32 arrays.
    """
    n = len(arrs_a)
    common = np.zeros(n, dtype=np.int32)
    denom = np.zeros(n, dtype=np.int32)
    if n == 0:
        return common, denom
    la = np.fromiter((len(a) for a in arrs_a), dtype=np.int64, count=n)
    lb = np.fromiter((len(b) for b in arrs_b), dtype=np.int64, count=n)
    lens = la + lb
    width = int(lens.max())
    if width == 0:
        return common, denom
    mat = _scratch("mat", (n, width), np.int64)
    mat.fill(_PAD)
    bad = np.zeros(n, dtype=bool)
    for i in range(n):
        a, b = arrs_a[i], arrs_b[i]
        row = mat[i]
        row[:la[i]] = a
        row[la[i]:lens[i]] = b
        # sentinel collision: inputs are sorted ascending, so only the
        # last element of either side can be the PAD value itself
        if (la[i] and a[la[i] - 1] == _PAD) or (lb[i] and b[lb[i] - 1] == _PAD):
            bad[i] = True
    mat.sort(axis=1, kind="stable")
    dup = _scratch("dup", (n, width - 1), np.bool_) if width > 1 else None
    if dup is None:
        # width == 1: single element, never shared
        denom[:] = np.minimum(sketch_size, lens).astype(np.int32)
        return common, denom
    np.equal(mat[:, 1:], mat[:, :-1], out=dup)
    notpad = _scratch("notpad", (n, width - 1), np.bool_)
    np.not_equal(mat[:, 1:], _PAD, out=notpad)
    dup &= notpad                     # real dup cells only
    dc = _scratch("dc", (n, width - 1), np.int32)
    np.cumsum(dup, axis=1, dtype=np.int32, out=dc)
    # rank(j) = (j+2) - Dc[j]  <= s   <=>   Dc[j] >= (j+2) - s
    thresh = (np.arange(width - 1, dtype=np.int32) + np.int32(2)
              - np.int32(sketch_size))
    inrank = _scratch("inrank", (n, width - 1), np.bool_)
    np.greater_equal(dc, thresh, out=inrank)
    inrank &= dup
    common[:] = inrank.sum(axis=1, dtype=np.int32)
    n_dup = dc[:, -1]                 # total real dup cells per row
    denom[:] = np.minimum(sketch_size, lens - n_dup).astype(np.int32)
    if bad.any():
        from .hashing import decode_signed

        for i in np.flatnonzero(bad):
            c, d = capped_merge_sorted(
                decode_signed(np.asarray(arrs_a[i], dtype=np.int64)),
                decode_signed(np.asarray(arrs_b[i], dtype=np.int64)),
                sketch_size)
            common[i], denom[i] = c, d
    return common, denom


def capped_merge_batch(sk_a: list, sk_b: list, sketch_size: int):
    """Vectorized-ish batch of capped merges; returns (common, denom) int64 arrays."""
    n = len(sk_a)
    common = np.zeros(n, dtype=np.int64)
    denom = np.zeros(n, dtype=np.int64)
    for i in range(n):
        c, d = capped_merge(sk_a[i], sk_b[i], sketch_size)
        common[i] = c
        denom[i] = d
    return common, denom


def jaccard(common, denom):
    common = np.asarray(common, dtype=np.float64)
    denom = np.asarray(denom, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        j = np.where(denom > 0, common / denom, 0.0)
    return j


def mash_distance(common, denom, k: int):
    """CommandDistance.cpp:387-407 incl. the -0 / inf guards and <=1 clamp."""
    common = np.asarray(common, dtype=np.float64)
    denom = np.asarray(denom, dtype=np.float64)
    j = jaccard(common, denom)
    with np.errstate(invalid="ignore", divide="ignore"):
        d = -np.log(2.0 * j / (1.0 + j)) / k
    d = np.where(common == denom, 0.0, np.where(common == 0, 1.0, np.minimum(d, 1.0)))
    return d


def containment(common, denom_query):
    """|A∩B| / |B| (CommandContain.cpp:231-263): denom counts only
    query-side merge steps, i.e. the query sketch size actually used."""
    return jaccard(common, denom_query)


def contain_sketches(ref: np.ndarray, query: np.ndarray) -> tuple[int, int]:
    """(common, used) of ``containSketches`` (CommandContain.cpp:231-263);
    score = common/used, error = 1/sqrt(used).

    Closed form of the reference two-pointer loop: ref-only elements are
    free (``steps--``), so ``steps`` counts consumed QUERY elements in
    ascending order; the loop stops after ``denom = min(|ref|, |query|)``
    query consumptions or when the ref list exhausts — query elements
    greater than max(ref) are never consumed. Hence
    ``used = min(denom, |{q : q <= max(ref)}|)`` and
    ``common = |ref ∩ query[:used]|``.
    """
    ref = np.asarray(ref, dtype=np.uint64)
    query = np.asarray(query, dtype=np.uint64)
    if len(ref) == 0 or len(query) == 0:
        return 0, 0
    denom = min(len(ref), len(query))
    used = int(min(denom, np.searchsorted(query, ref[-1], side="right")))
    common = int(np.intersect1d(ref, query[:used]).size)
    return common, used


def identity(common, denom, k: int):
    """estimateIdentity (CommandScreen.cpp:463-482): jaccard ** (1/k)."""
    common = np.asarray(common, dtype=np.float64)
    denom = np.asarray(denom, dtype=np.float64)
    j = jaccard(common, denom)
    with np.errstate(invalid="ignore", divide="ignore"):
        ident = np.power(j, 1.0 / k)
    ident = np.where(common == denom, 1.0, np.where(common == 0, 0.0, ident))
    return ident


# ---------------------------------------------------------------------------
# binomial tails (GSL gsl_cdf_binomial_Q replacement)
# ---------------------------------------------------------------------------


def _binom_sf_scalar(x_minus_1: int, r: float, n: int) -> float:
    """P(X >= x) for X ~ Binomial(n, r), x = x_minus_1 + 1, in log space."""
    x = x_minus_1 + 1
    if x <= 0:
        return 1.0
    if x > n:
        return 0.0
    if r <= 0.0:
        return 0.0
    if r >= 1.0:
        return 1.0
    log_r = math.log(r)
    log_q = math.log1p(-r)
    lgn = math.lgamma(n + 1)
    # log C(n,i) + i log r + (n-i) log q, summed i = x..n via logsumexp
    best = -math.inf
    terms = []
    for i in range(x, n + 1):
        t = lgn - math.lgamma(i + 1) - math.lgamma(n - i + 1) + i * log_r + (n - i) * log_q
        terms.append(t)
        if t > best:
            best = t
        # terms decay fast once past the mode; stop when negligible
        if t < best - 60 and i > n * r:
            break
    m = max(terms)
    if m == -math.inf:
        return 0.0
    return math.exp(m) * sum(math.exp(t - m) for t in terms)


def _tail_width(x: np.ndarray, r: np.ndarray, n: int) -> int:
    """Number of pmf terms past each row's own x any row still needs:
    terms beyond peak + 12 sigma + 30 sit > 60 nats below that row's max
    term, the same negligibility cutoff the scalar loop uses (residual
    < n*e^-60 relative ~ 1e-23)."""
    mode = np.floor((n + 1) * r)
    sig = np.sqrt(n * r * (1.0 - r))
    return int(min(n, np.max(np.maximum(x, mode) + 12.0 * sig + 30.0 - x))) + 1


def _binom_sf_tail_matrix(x: np.ndarray, r: np.ndarray, n: int,
                          width: int) -> np.ndarray:
    """Vectorized log-space tail sums for a same-``n`` batch: a
    (rows, width) matrix of log pmf terms at PER-ROW offsets x..x+width-1
    (each row only materializes the terms it needs — the tail starts at
    its own x), row-wise logsumexp. Same truncation criterion as the
    scalar path's early break; log-factorials from a cumsum table (error
    ~1e-14 at n=1000, far inside the ~6-sig-digit golden tolerance)."""
    lf = np.concatenate(([0.0], np.cumsum(np.log(np.arange(1, n + 1)))))
    idx = x[:, None] + np.arange(width, dtype=np.int64)[None, :]
    valid = idx <= n
    idx = np.minimum(idx, n)
    log_r = np.log(r)[:, None]
    log_q = np.log1p(-r)[:, None]
    lt = lf[n] - lf[idx] - lf[n - idx] + idx * log_r + (n - idx) * log_q
    lt[~valid] = -np.inf
    m = lt.max(axis=1)
    safe_m = np.where(np.isfinite(m), m, 0.0)
    out = np.exp(safe_m) * np.sum(np.exp(lt - safe_m[:, None]), axis=1)
    out[~np.isfinite(m)] = 0.0
    return out


def binom_sf(x_minus_1, r, n) -> np.ndarray:
    """Vector form of gsl_cdf_binomial_Q(x-1, r, n).

    Hot-path shape (verify/screen Arrow batches): n is one constant
    (sketch size) and many (x, r) repeat — the whole batch first dedups to
    unique (x, r, n) triples (screen batches collapse to <= s rows since r
    is constant), then each distinct n runs ONE matrix logsumexp instead
    of a per-row Python loop; the scalar path remains only as the
    fallback for huge-n outliers."""
    x_minus_1 = np.atleast_1d(np.asarray(x_minus_1, dtype=np.int64))
    shape = x_minus_1.shape
    x = (x_minus_1 + 1).ravel()
    r = np.broadcast_to(
        np.atleast_1d(np.asarray(r, dtype=np.float64)), shape).ravel()
    n = np.broadcast_to(
        np.atleast_1d(np.asarray(n, dtype=np.int64)), shape).ravel()
    out = np.empty(x.shape, dtype=np.float64)

    # boundary cases exactly as _binom_sf_scalar orders them
    one = x <= 0
    zero = ~one & ((x > n) | (r <= 0.0))
    one = one | (~zero & (r >= 1.0))
    general = ~(one | zero)
    out[one] = 1.0
    out[zero] = 0.0
    if general.any():
        gi = np.flatnonzero(general)
        keys = np.stack([x[gi].astype(np.float64), r[gi],
                         n[gi].astype(np.float64)], axis=1)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        vals = np.empty(len(uniq), dtype=np.float64)
        for nv in np.unique(uniq[:, 2]):
            rows = np.flatnonzero(uniq[:, 2] == nv)
            n_int = int(nv)
            xr = uniq[rows, 0].astype(np.int64)
            rr = uniq[rows, 1]
            width = _tail_width(xr, rr, n_int)
            if len(rows) * width <= 50_000_000 and n_int <= 5_000_000:
                vals[rows] = _binom_sf_tail_matrix(xr, rr, n_int, width)
            else:  # huge-n outlier: early-breaking scalar loop
                for j in rows:
                    vals[j] = _binom_sf_scalar(
                        int(uniq[j, 0]) - 1, float(uniq[j, 1]), n_int)
        out[gi] = vals[inv]
    # a full-distribution tail can round a float ulp above 1.0
    # (e.g. x=1, r->1): p-values are clamped to the probability range
    return np.minimum(out, 1.0).reshape(shape)


def pvalue_dist(common, length_ref, length_query, kmer_space: float, sketch_size):
    """dist p-value (CommandDistance.cpp:427-448).

    Random-match rate r = pX*pY/(pX+pY-pX*pY) with
    p_i = 1/(1 + kmer_space/length_i); tail P(X >= common) under
    Binomial(sketch_size, r). common==0 -> 1.
    """
    common = np.atleast_1d(np.asarray(common, dtype=np.int64))
    length_ref = np.broadcast_to(np.atleast_1d(np.asarray(length_ref, dtype=np.float64)), common.shape)
    length_query = np.broadcast_to(np.atleast_1d(np.asarray(length_query, dtype=np.float64)), common.shape)
    sketch_size = np.broadcast_to(np.atleast_1d(np.asarray(sketch_size, dtype=np.int64)), common.shape)
    px = 1.0 / (1.0 + kmer_space / length_ref)
    py = 1.0 / (1.0 + kmer_space / length_query)
    r = px * py / (px + py - px * py)
    out = binom_sf(common - 1, r, sketch_size)
    out[common == 0] = 1.0
    return out


def pvalue_screen(shared, set_size, kmer_space: float, sketch_size):
    """screen p-value (pValueWithin, CommandScreen.cpp:601-615):
    r = set_size / kmer_space; tail P(X >= shared) under
    Binomial(sketch_size, r). shared==0 -> 1."""
    shared = np.atleast_1d(np.asarray(shared, dtype=np.int64))
    set_size = np.broadcast_to(np.atleast_1d(np.asarray(set_size, dtype=np.float64)), shared.shape)
    sketch_size = np.broadcast_to(np.atleast_1d(np.asarray(sketch_size, dtype=np.int64)), shared.shape)
    r = set_size / kmer_space
    out = binom_sf(shared - 1, r, sketch_size)
    out[shared == 0] = 1.0
    return out


def error_bound(sketch_size: int) -> float:
    """Jaccard error bound 1/sqrt(s) (CommandContain.cpp:260,
    doc/sphinx/sketches.rst:57-61)."""
    return 1.0 / math.sqrt(sketch_size)
