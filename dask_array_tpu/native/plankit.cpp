// plankit: native chunk-plan algebra for dask_array_tpu.
//
// The role of the reference's Rust layer expanders
// (/root/reference/crates/dask-array-python — per-expression task
// expansion): in this runtime the execution plan is one XLA program, so the
// native-worthy hot loops are the *planning* primitives that scale with the
// number of blocks along an axis: slice->blockdim mapping, rechunk
// old->new intersection expansion, boundary-union refinement, and the
// token hash.  Python fallbacks exist for every entry point; version skew
// between this library and the Python wrapper fails loudly
// (PLANKIT_GENERATION handshake, mirroring the reference's
// NATIVE_BUILD_GENERATION discipline).
//
// Build: g++ -O3 -shared -fPIC plankit.cpp -o libplankit.so

#include <cstdint>
#include <cstddef>

extern "C" {

// bumped on every ABI/semantic change; checked by the Python wrapper
int64_t plankit_generation() { return 4; }

static inline int64_t ceil_div(int64_t a, int64_t b) {
    return (a + b - 1) / b;  // b > 0, a >= 0
}

// --- sliced blockdim -------------------------------------------------------
// Given per-block sizes chunks[0..n) along one axis and a normalized slice
// (start, stop, step) with step > 0 over the axis, write the per-block
// selected counts into counts[0..n).  Returns the number of blocks with a
// nonzero count.  (Negative steps are handled by the Python wrapper via the
// reversed-axis transform.)
int64_t sliced_blockdim_pos(
    const int64_t* chunks, int64_t n,
    int64_t start, int64_t stop, int64_t step,
    int64_t* counts)
{
    int64_t nonzero = 0;
    int64_t lo = 0;
    for (int64_t b = 0; b < n; ++b) {
        int64_t hi = lo + chunks[b];
        int64_t lo_eff = lo > start ? lo : start;
        int64_t hi_eff = hi < stop ? hi : stop;
        int64_t count = 0;
        if (hi_eff > lo_eff) {
            // first selected index >= lo_eff on the progression
            int64_t k0 = ceil_div(lo_eff - start, step);
            int64_t first = start + k0 * step;
            if (first < hi_eff) {
                count = (hi_eff - first - 1) / step + 1;
            }
        }
        counts[b] = count;
        if (count) ++nonzero;
        lo = hi;
    }
    return nonzero;
}

// --- rechunk old->new intersection ------------------------------------------
// For one axis: old chunks (n_old) -> new chunks (n_new).  Emits, for every
// new block in order, its decomposition into pieces of old blocks:
//   piece_old[k] = old block index, piece_lo[k]/piece_hi[k] = slice within it
// offsets[j] = first piece index of new block j; offsets[n_new] = n_pieces.
// Returns total piece count, or -1 if max_pieces is too small.
int64_t old_to_new_axis(
    const int64_t* oldc, int64_t n_old,
    const int64_t* newc, int64_t n_new,
    int64_t* piece_old, int64_t* piece_lo, int64_t* piece_hi,
    int64_t* offsets, int64_t max_pieces)
{
    int64_t k = 0;
    int64_t pos = 0;          // global start of current new block
    int64_t ob = 0;           // current old block index
    int64_t ob_start = 0;     // global start of old block ob
    for (int64_t j = 0; j < n_new; ++j) {
        offsets[j] = k;
        int64_t lo = pos;
        int64_t hi = pos + newc[j];
        // advance past old blocks entirely before lo
        while (ob < n_old && ob_start + oldc[ob] <= lo) {
            ob_start += oldc[ob];
            ++ob;
        }
        int64_t b = ob;
        int64_t b_start = ob_start;
        while (b < n_old && b_start < hi) {
            int64_t s = (lo > b_start ? lo : b_start) - b_start;
            int64_t b_end = b_start + oldc[b];
            int64_t e = (hi < b_end ? hi : b_end) - b_start;
            if (e > s) {
                if (k >= max_pieces) return -1;
                piece_old[k] = b;
                piece_lo[k] = s;
                piece_hi[k] = e;
                ++k;
            }
            b_start = b_end;
            ++b;
        }
        pos = hi;
    }
    offsets[n_new] = k;
    return k;
}

// --- boundary-union refinement -----------------------------------------------
// Common refinement of two blockdims with equal totals: merge-walk of both
// boundary sequences.  Writes the refined chunks to out; returns length,
// or -1 if max_out is too small.
int64_t refine_axis(
    const int64_t* a, int64_t na,
    const int64_t* b, int64_t nb,
    int64_t* out, int64_t max_out)
{
    int64_t ia = 0, ib = 0;
    int64_t pa = 0, pb = 0;   // next boundaries
    int64_t prev = 0;
    int64_t k = 0;
    int64_t enda = 0, endb = 0;
    for (int64_t i = 0; i < na; ++i) enda += a[i];
    for (int64_t i = 0; i < nb; ++i) endb += b[i];
    if (enda != endb) return -2;
    pa = (na > 0) ? a[0] : 0;
    pb = (nb > 0) ? b[0] : 0;
    while (ia < na || ib < nb) {
        int64_t nxt;
        if (ia < na && (ib >= nb || pa <= pb)) {
            nxt = pa;
        } else {
            nxt = pb;
        }
        if (ia < na && pa == nxt) { ++ia; if (ia < na) pa += a[ia]; }
        if (ib < nb && pb == nxt) { ++ib; if (ib < nb) pb += b[ib]; }
        if (nxt > prev) {
            if (k >= max_out) return -1;
            out[k++] = nxt - prev;
            prev = nxt;
        }
    }
    return k;
}

// --- moved fraction (rechunk cost model) ----------------------------------------
// Min-model fraction of one axis's elements a src->dst relayout moves:
// each dst chunk is assembled where its largest single-src piece lives.
// Mirrors _rechunk._axis_moved_fraction (and the reference's moved_fraction,
// _expr.py:675); hot in explain/transfer estimates and the unify audition.
// Returns moved fraction in [0,1]; -1.0 on total mismatch.
double moved_fraction_axis(
    const int64_t* src, int64_t n_src,
    const int64_t* dst, int64_t n_dst)
{
    int64_t total = 0;
    for (int64_t i = 0; i < n_src; ++i) total += src[i];
    int64_t total_d = 0;
    for (int64_t j = 0; j < n_dst; ++j) total_d += dst[j];
    if (total == 0) return 0.0;
    if (total != total_d) return -1.0;
    if (n_src == n_dst) {
        bool same = true;
        for (int64_t i = 0; i < n_src; ++i) if (src[i] != dst[i]) { same = false; break; }
        if (same) return 0.0;
    }
    double moved = 0.0;
    int64_t i = 0;
    int64_t src_lo = 0;
    int64_t dst_lo = 0;
    for (int64_t j = 0; j < n_dst; ++j) {
        int64_t dst_hi = dst_lo + dst[j];
        int64_t best = 0;
        for (;;) {
            int64_t src_hi = src_lo + src[i];
            int64_t lo = src_lo > dst_lo ? src_lo : dst_lo;
            int64_t hi = src_hi < dst_hi ? src_hi : dst_hi;
            int64_t overlap = hi - lo;
            if (overlap > best) best = overlap;
            if (src_hi <= dst_hi && i + 1 < n_src) {
                ++i;
                src_lo = src_hi;
            } else {
                break;
            }
        }
        moved += (double)(dst[j] - best);
        dst_lo = dst_hi;
    }
    return moved / (double)total;
}

// --- boundary intersection (coarsest common coarsening) ---------------------------
// Chunks whose boundaries appear in BOTH inputs; equal totals required.
// Writes coarse chunks to out; returns length, -1 if max_out too small,
// -2 on total mismatch.
int64_t coarse_axis(
    const int64_t* a, int64_t na,
    const int64_t* b, int64_t nb,
    int64_t* out, int64_t max_out)
{
    int64_t enda = 0, endb = 0;
    for (int64_t i = 0; i < na; ++i) enda += a[i];
    for (int64_t i = 0; i < nb; ++i) endb += b[i];
    if (enda != endb) return -2;
    int64_t ia = 0, ib = 0;
    int64_t pa = 0, pb = 0;
    int64_t prev = 0, k = 0;
    while (ia < na && ib < nb) {
        int64_t ba = pa + a[ia];
        int64_t bb = pb + b[ib];
        if (ba == bb) {
            if (k >= max_out) return -1;
            out[k++] = ba - prev;
            prev = ba;
            pa = ba; ++ia;
            pb = bb; ++ib;
        } else if (ba < bb) {
            pa = ba; ++ia;
        } else {
            pb = bb; ++ib;
        }
    }
    return k;
}

// --- rechunk stage degree ------------------------------------------------------
// Max number of old blocks feeding any single new block along one axis
// (the planner's fan-in bound; reference _rechunk.py:395 _bound_degree).
int64_t stage_degree_axis(
    const int64_t* oldc, int64_t n_old,
    const int64_t* newc, int64_t n_new)
{
    int64_t deg = 1;
    int64_t pos = 0;
    int64_t ob = 0, ob_start = 0;
    for (int64_t j = 0; j < n_new; ++j) {
        int64_t lo = pos;
        int64_t hi = pos + newc[j];
        while (ob < n_old && ob_start + oldc[ob] <= lo) {
            ob_start += oldc[ob];
            ++ob;
        }
        int64_t b = ob, b_start = ob_start, count = 0;
        while (b < n_old && b_start < hi) {
            ++count;
            b_start += oldc[b];
            ++b;
        }
        if (count > deg) deg = count;
        pos = hi;
    }
    return deg;
}

// --- fingerprint hash -----------------------------------------------------------
// FNV-1a 64-bit over a byte buffer: a fast non-cryptographic fingerprint for
// diagnostics/dedup probes.  Expression tokens stay on blake2b (collision
// resistance matters for content addressing).
uint64_t hash_bytes(const unsigned char* data, int64_t n) {
    uint64_t h = 1469598103934665603ULL;
    for (int64_t i = 0; i < n; ++i) {
        h ^= (uint64_t)data[i];
        h *= 1099511628211ULL;
    }
    return h;
}

// --- block-coordinate expansion --------------------------------------------------
// Row-major enumeration helper: for a grid with nblocks[d] blocks per dim
// (ndim dims), fill coords[i*ndim + d] for i in [0, total).  Lets the
// executor's per-block loops consume a flat int64 table instead of
// np.ndindex.  Returns total block count, or -1 if max_total too small.
int64_t expand_grid(
    const int64_t* nblocks, int64_t ndim,
    int64_t* coords, int64_t max_total)
{
    int64_t total = 1;
    for (int64_t d = 0; d < ndim; ++d) total *= nblocks[d];
    if (total > max_total) return -1;
    for (int64_t i = 0; i < total; ++i) {
        int64_t rem = i;
        for (int64_t d = ndim - 1; d >= 0; --d) {
            coords[i * ndim + d] = rem % nblocks[d];
            rem /= nblocks[d];
        }
    }
    return total;
}

}  // extern "C"
