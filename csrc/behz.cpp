// Native multi-threaded host baseline: complete BFV/CKKS op pipelines.
//
// Purpose (bench honesty): the chip's vs_baseline must compare against a
// reference-class CPU implementation — the same role Lattigo's Go kernels
// play under the reference's <=32-thread pool (mega_ag_runners/
// cpu_wrapper.cpp:57, examples/benchmark_cpu/benchmark_cpu.cpp:27-51).
// These kernels are a bit-exact C++ port of the framework's own BEHZ /
// hybrid-key-switch math (schemes/bfv.py, schemes/keyswitch.py,
// core/rns.py), validated by tests/test_native.py: identical formulas,
// identical canonical residues at every step.
//
// All constants are marshaled from Python as a pool of u64 buffers
// (void** + dims); see lattisense_tpu/native_behz.py for the layout
// contract. Threads share the read-only constant pool and inputs; each
// has its own scratch arena.

#include <chrono>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

using u64 = std::uint64_t;
using i64 = long long;
using u128 = unsigned __int128;

namespace {

// ---- scalar primitives (identical to lattisense_host.cpp / core/u64.py) --

inline u64 addmod(u64 a, u64 b, u64 q) {
    u64 s = a + b;
    return s >= q ? s - q : s;
}

inline u64 submod(u64 a, u64 b, u64 q) { return a >= b ? a - b : a + q - b; }

inline u64 mulhi(u64 a, u64 b) { return (u64)(((u128)a * b) >> 64); }

inline u64 shoup_mul(u64 a, u64 w, u64 w_sh, u64 q) {
    u64 hi = mulhi(a, w_sh);
    u64 r = a * w - hi * q;
    return r >= q ? r - q : r;
}

inline u64 redc(u64 hi, u64 lo, u64 q, u64 pinv) {
    u64 m = lo * pinv;
    u64 t = hi + mulhi(m, q) + (lo != 0);
    return t >= q ? t - q : t;
}

inline u64 mont_mul(u64 a, u64 b, u64 q, u64 pinv) {
    u128 p = (u128)a * b;
    return redc((u64)(p >> 64), (u64)p, q, pinv);
}

inline u64 from_mont(u64 a, u64 q, u64 pinv) { return redc(0, a, q, pinv); }

// ---- batched NTT over an (L, n) stack (tables per limb) ------------------

void ntt_fwd(u64* x, const u64* tbl, const u64* tbl_sh, const u64* q, long L,
             long n) {
    for (long l = 0; l < L; ++l) {
        u64* xr = x + l * n;
        const u64* t1 = tbl + l * n;
        const u64* t2 = tbl_sh + l * n;
        u64 qi = q[l];
        long t = n;
        for (long m = 1; m < n; m <<= 1) {
            t >>= 1;
            for (long k = 0; k < m; ++k) {
                u64 s = t1[m + k], s_sh = t2[m + k];
                u64* xa = xr + 2 * k * t;
                u64* xb = xa + t;
                for (long j = 0; j < t; ++j) {
                    u64 u = xa[j];
                    u64 v = shoup_mul(xb[j], s, s_sh, qi);
                    xa[j] = addmod(u, v, qi);
                    xb[j] = submod(u, v, qi);
                }
            }
        }
    }
}

void ntt_inv(u64* x, const u64* tbl, const u64* tbl_sh, const u64* ninv,
             const u64* ninv_sh, const u64* q, long L, long n) {
    for (long l = 0; l < L; ++l) {
        u64* xr = x + l * n;
        const u64* t1 = tbl + l * n;
        const u64* t2 = tbl_sh + l * n;
        u64 qi = q[l];
        long t = 1;
        for (long m = n >> 1; m >= 1; m >>= 1) {
            for (long k = 0; k < m; ++k) {
                u64 s = t1[m + k], s_sh = t2[m + k];
                u64* xa = xr + 2 * k * t;
                u64* xb = xa + t;
                for (long j = 0; j < t; ++j) {
                    u64 u = xa[j], v = xb[j];
                    xa[j] = addmod(u, v, qi);
                    xb[j] = shoup_mul(submod(u, v, qi), s, s_sh, qi);
                }
            }
            t <<= 1;
        }
        for (long j = 0; j < n; ++j)
            xr[j] = shoup_mul(xr[j], ninv[l], ninv_sh[l], qi);
    }
}

// ---- constant-pool layout (contract with native_behz.py) -----------------

enum Buf {
    B_Q = 0, B_QPINV, B_QR2, B_QPSI, B_QPSI_SH, B_QIPSI, B_QIPSI_SH,
    B_QNINV, B_QNINV_SH,                                     // ring Q (Lq)
    B_A, B_APINV, B_AR2, B_APSI, B_APSI_SH, B_AIPSI, B_AIPSI_SH,
    B_ANINV, B_ANINV_SH,                                     // ring AUX (Td)
    B_MT_MONT, B_EXT_QHI, B_EXT_QHI_SH, B_EXT_QH_DST, B_EXT_QH_MT,
    B_SM_SCAL, B_SM_QMONT, B_SM_MTINV,                       // ExactExtend/SmMRq
    B_T_MONT_Q, B_T_MONT_A, B_QINV_MONT_A,                   // scale_and_back
    B_SH_QHI, B_SH_QHI_SH, B_SH_QH_DST, B_SH_SCAL, B_B_MONT, // Shenoy
    B_K, B_KPINV, B_KPSI, B_KPSI_SH, B_KIPSI, B_KIPSI_SH, B_KNINV,
    B_KNINV_SH,                                              // ring QP (Tk)
    B_KS_QHI, B_KS_QHI_SH, B_KS_SRCQ, B_KS_QHCONV,           // ks decompose
    B_RD_QHI, B_RD_QHI_SH, B_RD_QH_DST, B_P, B_PPINV, B_HALF_P, B_HALF_Q,
    B_PINV_MONT,                                             // RoundDivP
    B_RS_QLINV_MONT, B_RS_SCAL,                              // DivRoundLast
    B_COUNT
};

// dims: [0]=n [1]=Lq [2]=Td [3]=alpha [4]=beta [5]=Tk [6]=mtilde [7]=t
struct Pool {
    void* const* b;
    const i64* d;
    long n, Lq, Td, alpha, beta, Tk;
    u64 mtilde;
    const u64* u(int i) const { return (const u64*)b[i]; }
    explicit Pool(void* const* bufs, const i64* dims) : b(bufs), d(dims) {
        n = (long)dims[0]; Lq = (long)dims[1]; Td = (long)dims[2];
        alpha = (long)dims[3]; beta = (long)dims[4]; Tk = (long)dims[5];
        mtilde = (u64)dims[6];
    }
};

struct Scratch {
    std::vector<u64> mem;
    size_t off = 0;
    u64* take(size_t count) {
        u64* p = mem.data() + off;
        off += count;
        return p;
    }
    void reset() { off = 0; }
    void ensure(size_t count) { if (mem.size() < count) mem.resize(count); }
};

// ---- BEHZ pieces (bit-exact ports of core/rns.py classes) ----------------

// ExactExtend: x (Lq, n) coeff -> out (Td, n). scratch: y (Lq, n).
void exact_extend(const Pool& P, const u64* x, u64* out, u64* y) {
    const u64* q = P.u(B_Q);
    const u64* qpinv = P.u(B_QPINV);
    const u64* mt_mont = P.u(B_MT_MONT);
    const u64* qhi = P.u(B_EXT_QHI);
    const u64* qhi_sh = P.u(B_EXT_QHI_SH);
    const u64* qh_dst = P.u(B_EXT_QH_DST);  // (Td, Lq)
    const u64* qh_mt = P.u(B_EXT_QH_MT);    // (Lq)
    const u64* a_mod = P.u(B_A);
    const u64* a_pinv = P.u(B_APINV);
    const u64 neg_qinv_mt = P.u(B_SM_SCAL)[0];
    const u64* sm_qmont = P.u(B_SM_QMONT);
    const u64* sm_mtinv = P.u(B_SM_MTINV);
    const u64 mt = P.mtilde, mask = mt - 1, half = mt >> 1;
    long n = P.n;
    // y_i = [[x*mtilde]_q * qhat_inv]_q   (decompose of x*mtilde)
    for (long i = 0; i < P.Lq; ++i)
        for (long j = 0; j < n; ++j) {
            u64 xm = mont_mul(x[i * n + j], mt_mont[i], q[i], qpinv[i]);
            y[i * n + j] = shoup_mul(xm, qhi[i], qhi_sh[i], q[i]);
        }
    for (long t = 0; t < P.Td; ++t) {
        u64 dt = a_mod[t], dpinv = a_pinv[t];
        u64* ot = out + t * n;
        for (long j = 0; j < n; ++j) {
            // FastBConv to d_t (canonical sequential fold == modsum_tree)
            u64 acc = mont_mul(y[j], qh_dst[t * P.Lq + 0], dt, dpinv);
            for (long i = 1; i < P.Lq; ++i)
                acc = addmod(acc,
                             mont_mul(y[i * n + j], qh_dst[t * P.Lq + i], dt, dpinv),
                             dt);
            // SmMRq correction using the mtilde image
            u64 s_mt = 0;
            for (long i = 0; i < P.Lq; ++i)
                s_mt += (y[i * n + j] & mask) * qh_mt[i];
            u64 r = (s_mt * neg_qinv_mt) & mask;
            u64 r_mod = (r >= half) ? dt - (mt - r) : r;
            u64 term = mont_mul(r_mod, sm_qmont[t], dt, dpinv);
            u64 s = addmod(acc, term, dt);
            ot[j] = mont_mul(s, sm_mtinv[t], dt, dpinv);
        }
    }
}

// scale_and_back: d_q (Lq, n), d_aux (Td, n) -> out (Lq, n).
// scratch: u (Lq, n), w (Td, n), full (Lq+1, n).
void scale_and_back(const Pool& P, const u64* d_q, const u64* d_aux, u64* out,
                    u64* uu, u64* w, u64* full) {
    const u64* q = P.u(B_Q);
    const u64* qpinv = P.u(B_QPINV);
    const u64* a_mod = P.u(B_A);
    const u64* a_pinv = P.u(B_APINV);
    const u64* tq = P.u(B_T_MONT_Q);
    const u64* ta = P.u(B_T_MONT_A);
    const u64* qinv_a = P.u(B_QINV_MONT_A);
    const u64* qhi = P.u(B_EXT_QHI);
    const u64* qhi_sh = P.u(B_EXT_QHI_SH);
    const u64* qh_dst = P.u(B_EXT_QH_DST);  // (Td, Lq) — conv_q_to_aux == extend's
    long n = P.n;
    // u = [t*d_q]_Q, then decompose in place for the q->aux conversion
    for (long i = 0; i < P.Lq; ++i)
        for (long j = 0; j < n; ++j) {
            u64 v = mont_mul(d_q[i * n + j], tq[i], q[i], qpinv[i]);
            uu[i * n + j] = shoup_mul(v, qhi[i], qhi_sh[i], q[i]);
        }
    // w_t = [ (t*d_aux - conv(u)) * Q^-1 ]_{d_t}
    for (long t = 0; t < P.Td; ++t) {
        u64 dt = a_mod[t], dpinv = a_pinv[t];
        for (long j = 0; j < n; ++j) {
            u64 conv = mont_mul(uu[j], qh_dst[t * P.Lq + 0], dt, dpinv);
            for (long i = 1; i < P.Lq; ++i)
                conv = addmod(conv,
                              mont_mul(uu[i * n + j], qh_dst[t * P.Lq + i], dt, dpinv),
                              dt);
            u64 td = mont_mul(d_aux[t * n + j], ta[t], dt, dpinv);
            w[t * n + j] = mont_mul(submod(td, conv, dt), qinv_a[t], dt, dpinv);
        }
    }
    // Shenoy: w rows [0, Tb) are the B-basis residues, row Tb (= Td-1) is
    // the redundant m_sk residue (left untouched by the in-place decompose
    // below, which only rewrites rows < Tb).
    const u64* sh_qhi = P.u(B_SH_QHI);
    const u64* sh_qhi_sh = P.u(B_SH_QHI_SH);
    const u64* sh_dst = P.u(B_SH_QH_DST);   // (Lq+1, Tb)
    const u64 m_sk = P.u(B_SH_SCAL)[0];
    const u64 sk_pinv = P.u(B_SH_SCAL)[1];
    const u64 binv_sk_mont = P.u(B_SH_SCAL)[2];
    const u64* b_mont = P.u(B_B_MONT);
    const u64* a_b = P.u(B_A);  // first Tb aux moduli are the b primes
    long Tb = P.Td - 1;
    // decompose w in the b basis (in place, rows < Tb only)
    for (long i = 0; i < Tb; ++i)
        for (long j = 0; j < n; ++j)
            w[i * n + j] = shoup_mul(w[i * n + j], sh_qhi[i], sh_qhi_sh[i], a_b[i]);
    // convert to q..., m_sk
    for (long t = 0; t < P.Lq + 1; ++t) {
        u64 dt = (t < P.Lq) ? q[t] : m_sk;
        u64 dpinv = (t < P.Lq) ? qpinv[t] : sk_pinv;
        for (long j = 0; j < n; ++j) {
            u64 acc = mont_mul(w[j], sh_dst[t * Tb + 0], dt, dpinv);
            for (long i = 1; i < Tb; ++i)
                acc = addmod(acc, mont_mul(w[i * n + j], sh_dst[t * Tb + i], dt, dpinv),
                             dt);
            full[t * n + j] = acc;
        }
    }
    // alpha = [ (conv_sk - x_sk) * B^-1 ]_{m_sk}, centered; correct per limb
    u64 half_sk = m_sk >> 1;
    for (long j = 0; j < n; ++j) {
        u64 diff = submod(full[P.Lq * n + j], w[Tb * n + j], m_sk);
        full[P.Lq * n + j] = mont_mul(diff, binv_sk_mont, m_sk, sk_pinv);
    }
    for (long i = 0; i < P.Lq; ++i) {
        u64 dt = q[i], dpinv = qpinv[i];
        for (long j = 0; j < n; ++j) {
            u64 al = full[P.Lq * n + j];
            u64 al_mod = (al >= half_sk) ? dt - (m_sk - al) : al;
            u64 corr = mont_mul(al_mod, b_mont[i], dt, dpinv);
            out[i * n + j] = submod(full[i * n + j], corr, dt);
        }
    }
}

// Hybrid key switch of coeff-domain x (Lq, n) -> e0, e1 (Lq, n).
// key: (beta, 2, Tk, n). scratch sized by caller.
void key_switch(const Pool& P, const u64* x, const u64* key, u64* e0, u64* e1,
                Scratch& S) {
    long n = P.n, Lq = P.Lq, alpha = P.alpha, beta = P.beta, Tk = P.Tk;
    const u64* k_mod = P.u(B_K);
    const u64* k_pinv = P.u(B_KPINV);
    const u64* ks_qhi = P.u(B_KS_QHI);      // (beta, alpha)
    const u64* ks_qhi_sh = P.u(B_KS_QHI_SH);
    const u64* ks_srcq = P.u(B_KS_SRCQ);
    const u64* ks_conv = P.u(B_KS_QHCONV);  // (beta, Tk, alpha)
    u64* y = S.take(beta * alpha * n);
    u64* digits = S.take(beta * Tk * n);
    // decompose (zero-padded ragged last digit handled by qhat_inv==0)
    for (long d = 0; d < beta; ++d)
        for (long j2 = 0; j2 < alpha; ++j2) {
            long src = d * alpha + j2;
            const u64* xr = (src < Lq) ? x + src * n : nullptr;
            u64* yr = y + (d * alpha + j2) * n;
            u64 w = ks_qhi[d * alpha + j2], w_sh = ks_qhi_sh[d * alpha + j2];
            u64 qq = ks_srcq[d * alpha + j2];
            if (!xr || w == 0) {
                std::memset(yr, 0, n * sizeof(u64));
            } else {
                for (long j = 0; j < n; ++j) yr[j] = shoup_mul(xr[j], w, w_sh, qq);
            }
        }
    // mod-up per digit to Q∪P
    for (long d = 0; d < beta; ++d)
        for (long t = 0; t < Tk; ++t) {
            u64 dt = k_mod[t], dpinv = k_pinv[t];
            u64* dr = digits + (d * Tk + t) * n;
            const u64* cv = ks_conv + (d * Tk + t) * alpha;
            const u64* y0 = y + d * alpha * n;
            for (long j = 0; j < n; ++j) {
                u64 acc = mont_mul(y0[j], cv[0], dt, dpinv);
                for (long j2 = 1; j2 < alpha; ++j2)
                    acc = addmod(acc, mont_mul(y0[j2 * n + j], cv[j2], dt, dpinv), dt);
                dr[j] = acc;
            }
        }
    // NTT each digit over ring QP
    for (long d = 0; d < beta; ++d)
        ntt_fwd(digits + d * Tk * n, P.u(B_KPSI), P.u(B_KPSI_SH), k_mod, Tk, n);
    // gadget inner product
    u64* acc0 = S.take(Tk * n);
    u64* acc1 = S.take(Tk * n);
    for (long t = 0; t < Tk; ++t) {
        u64 dt = k_mod[t], dpinv = k_pinv[t];
        for (long j = 0; j < n; ++j) {
            u64 a0 = 0, a1 = 0;
            for (long d = 0; d < beta; ++d) {
                u64 dig = digits[(d * Tk + t) * n + j];
                u64 m0 = mont_mul(dig, key[((d * 2 + 0) * Tk + t) * n + j], dt, dpinv);
                u64 m1 = mont_mul(dig, key[((d * 2 + 1) * Tk + t) * n + j], dt, dpinv);
                a0 = d == 0 ? m0 : addmod(a0, m0, dt);
                a1 = d == 0 ? m1 : addmod(a1, m1, dt);
            }
            acc0[t * n + j] = a0;
            acc1[t * n + j] = a1;
        }
    }
    // INTT + round-div-P
    const u64* rd_qhi = P.u(B_RD_QHI);
    const u64* rd_qhi_sh = P.u(B_RD_QHI_SH);
    const u64* rd_dst = P.u(B_RD_QH_DST);   // (Lq, alpha)
    const u64* p_mod = P.u(B_P);
    const u64* half_p = P.u(B_HALF_P);
    const u64* half_q = P.u(B_HALF_Q);
    const u64* pinv_mont = P.u(B_PINV_MONT);
    const u64* q = P.u(B_Q);
    const u64* qpinv = P.u(B_QPINV);
    u64* yp = S.take(alpha * n);
    u64* accs[2] = {acc0, acc1};
    u64* outs[2] = {e0, e1};
    for (int c = 0; c < 2; ++c) {
        u64* a = accs[c];
        ntt_inv(a, P.u(B_KIPSI), P.u(B_KIPSI_SH), P.u(B_KNINV), P.u(B_KNINV_SH),
                k_mod, Tk, n);
        // decompose the P part (+half_p) in the p basis
        for (long i = 0; i < alpha; ++i)
            for (long j = 0; j < n; ++j) {
                u64 v = addmod(a[(Lq + i) * n + j], half_p[i], p_mod[i]);
                yp[i * n + j] = shoup_mul(v, rd_qhi[i], rd_qhi_sh[i], p_mod[i]);
            }
        // HPS overflow correction (bit-parity with RoundDivP.__call__:
        // same reciprocal-multiply then sequential sum in double)
        double ipf[64];
        for (long i = 0; i < alpha; ++i) ipf[i] = 1.0 / (double)p_mod[i];
        for (long i = 0; i < Lq; ++i) {
            u64 qi = q[i], pi = qpinv[i];
            for (long j = 0; j < n; ++j) {
                u64 conv = mont_mul(yp[j], rd_dst[i * alpha + 0], qi, pi);
                for (long j2 = 1; j2 < alpha; ++j2)
                    conv = addmod(conv,
                                  mont_mul(yp[j2 * n + j], rd_dst[i * alpha + j2], qi, pi),
                                  qi);
                u64 num = submod(addmod(a[i * n + j], half_q[i], qi), conv, qi);
                u64 e = mont_mul(num, pinv_mont[i], qi, pi);
                double f = 0.0;
                for (long j2 = 0; j2 < alpha; ++j2)
                    f += (double)yp[j2 * n + j] * ipf[j2];
                outs[c][i * n + j] = addmod(e, (u64)f, qi);
            }
        }
    }
}

// BEHZ mult: a, b (2, Lq, n) coeff -> d3 (3, Lq, n) coeff.
void behz_mult(const Pool& P, const u64* a, const u64* b, u64* d3, Scratch& S) {
    long n = P.n, Lq = P.Lq, Td = P.Td;
    const u64* q = P.u(B_Q);
    const u64* qpinv = P.u(B_QPINV);
    const u64* qr2 = P.u(B_QR2);
    const u64* am = P.u(B_A);
    const u64* apinv = P.u(B_APINV);
    const u64* ar2 = P.u(B_AR2);
    u64* ext = S.take(4 * Td * n);
    u64* fq = S.take(4 * Lq * n);
    u64* fa = S.take(4 * Td * n);
    u64* ydec = S.take(Lq * n);
    const u64* polys[4] = {a, a + Lq * n, b, b + Lq * n};
    for (int p4 = 0; p4 < 4; ++p4) {
        exact_extend(P, polys[p4], ext + p4 * Td * n, ydec);
        // fq = to_mont(ntt(poly, ring q))
        u64* f = fq + p4 * Lq * n;
        std::memcpy(f, polys[p4], Lq * n * sizeof(u64));
        ntt_fwd(f, P.u(B_QPSI), P.u(B_QPSI_SH), q, Lq, n);
        for (long i = 0; i < Lq; ++i)
            for (long j = 0; j < n; ++j)
                f[i * n + j] = mont_mul(f[i * n + j], qr2[i], q[i], qpinv[i]);
        // fa = to_mont(ntt(ext, ring aux))
        u64* g = fa + p4 * Td * n;
        std::memcpy(g, ext + p4 * Td * n, Td * n * sizeof(u64));
        ntt_fwd(g, P.u(B_APSI), P.u(B_APSI_SH), am, Td, n);
        for (long i = 0; i < Td; ++i)
            for (long j = 0; j < n; ++j)
                g[i * n + j] = mont_mul(g[i * n + j], ar2[i], am[i], apinv[i]);
    }
    // tensor products, from_mont, INTT
    u64* dq = S.take(3 * Lq * n);
    u64* da = S.take(3 * Td * n);
    auto tensor = [n](const u64* f0, const u64* f1, const u64* f2, const u64* f3,
                      u64* d0, u64* d1, u64* d2, const u64* mod, const u64* pinv,
                      long L) {
        for (long i = 0; i < L; ++i) {
            u64 qi = mod[i], pi = pinv[i];
            for (long j = 0; j < n; ++j) {
                long o = i * n + j;
                d0[o] = mont_mul(f0[o], f2[o], qi, pi);
                d1[o] = addmod(mont_mul(f0[o], f3[o], qi, pi),
                               mont_mul(f1[o], f2[o], qi, pi), qi);
                d2[o] = mont_mul(f1[o], f3[o], qi, pi);
            }
        }
    };
    tensor(fq, fq + Lq * n, fq + 2 * Lq * n, fq + 3 * Lq * n, dq, dq + Lq * n,
           dq + 2 * Lq * n, q, qpinv, Lq);
    tensor(fa, fa + Td * n, fa + 2 * Td * n, fa + 3 * Td * n, da, da + Td * n,
           da + 2 * Td * n, am, apinv, Td);
    for (int c = 0; c < 3; ++c) {
        u64* dqr = dq + c * Lq * n;
        for (long i = 0; i < Lq; ++i)
            for (long j = 0; j < n; ++j)
                dqr[i * n + j] = from_mont(dqr[i * n + j], q[i], qpinv[i]);
        ntt_inv(dqr, P.u(B_QIPSI), P.u(B_QIPSI_SH), P.u(B_QNINV), P.u(B_QNINV_SH),
                q, Lq, n);
        u64* dar = da + c * Td * n;
        for (long i = 0; i < Td; ++i)
            for (long j = 0; j < n; ++j)
                dar[i * n + j] = from_mont(dar[i * n + j], am[i], apinv[i]);
        ntt_inv(dar, P.u(B_AIPSI), P.u(B_AIPSI_SH), P.u(B_ANINV), P.u(B_ANINV_SH),
                am, Td, n);
    }
    // scale by t/Q and convert back (per component)
    u64* uu = S.take(Lq * n);
    u64* w = S.take(Td * n);
    u64* full = S.take((Lq + 1) * n);
    for (int c = 0; c < 3; ++c)
        scale_and_back(P, dq + c * Lq * n, da + c * Td * n, d3 + c * Lq * n, uu,
                       w, full);
}

size_t scratch_words(const Pool& P) {
    long n = P.n, Lq = P.Lq, Td = P.Td, Tk = P.Tk;
    size_t mult = (size_t)(4 * Td + 4 * Lq + 4 * Td + Lq + 3 * Lq + 3 * Td + Lq +
                           Td + (Lq + 1)) * n;
    size_t ksw = (size_t)(P.beta * P.alpha + P.beta * Tk + 2 * Tk + P.alpha) * n;
    return mult + ksw + 16 * n;
}

}  // namespace

extern "C" {

// Single-op entry points (validation vs the Python golden engine).

void ls_bfv_mult_relin(void* const* bufs, const i64* dims, const u64* a,
                       const u64* b, const u64* rlk, u64* out) {
    Pool P(bufs, dims);
    Scratch S;
    S.ensure(scratch_words(P) + 3 * P.Lq * P.n + 2 * P.Lq * P.n);
    std::vector<u64> d3(3 * P.Lq * P.n), e0(P.Lq * P.n), e1(P.Lq * P.n);
    behz_mult(P, a, b, d3.data(), S);
    S.reset();
    key_switch(P, d3.data() + 2 * P.Lq * P.n, rlk, e0.data(), e1.data(), S);
    for (long i = 0; i < P.Lq; ++i)
        for (long j = 0; j < P.n; ++j) {
            long o = i * P.n + j;
            out[o] = addmod(d3[o], e0[o], P.u(B_Q)[i]);
            out[P.Lq * P.n + o] = addmod(d3[P.Lq * P.n + o], e1[o], P.u(B_Q)[i]);
        }
}

// BFV rotate: coeff-domain ct (2, Lq, n), automorphism maps (src, sign)
// each (n,), Galois key (beta, 2, Tk, n).
void ls_bfv_rotate(void* const* bufs, const i64* dims, const u64* ct,
                   const u64* autom_src, const u64* autom_sign, const u64* glk,
                   u64* out) {
    Pool P(bufs, dims);
    long n = P.n, Lq = P.Lq;
    const u64* q = P.u(B_Q);
    Scratch S;
    S.ensure(scratch_words(P));
    std::vector<u64> rot(2 * Lq * n), e0(Lq * n), e1(Lq * n);
    for (int c = 0; c < 2; ++c)
        for (long i = 0; i < Lq; ++i) {
            const u64* xr = ct + (c * Lq + i) * n;
            u64* orr = rot.data() + (c * Lq + i) * n;
            for (long j = 0; j < n; ++j) {
                u64 v = xr[autom_src[j]];
                orr[j] = autom_sign[j] ? (v == 0 ? 0 : q[i] - v) : v;
            }
        }
    key_switch(P, rot.data() + Lq * n, glk, e0.data(), e1.data(), S);
    for (long i = 0; i < Lq; ++i)
        for (long j = 0; j < n; ++j) {
            long o = i * n + j;
            out[o] = addmod(rot[o], e0[o], q[i]);
            out[Lq * n + o] = e1[o];
        }
}

// CKKS mult_relin_rescale: NTT-domain cts (2, Lq, n) -> (2, Lq-1, n).
void ls_ckks_mult_relin_rescale(void* const* bufs, const i64* dims,
                                const u64* a, const u64* b, const u64* rlk,
                                u64* out) {
    Pool P(bufs, dims);
    long n = P.n, Lq = P.Lq;
    const u64* q = P.u(B_Q);
    const u64* qpinv = P.u(B_QPINV);
    const u64* qr2 = P.u(B_QR2);
    Scratch S;
    S.ensure(scratch_words(P));
    std::vector<u64> d(3 * Lq * n), e0(Lq * n), e1(Lq * n), c2(Lq * n);
    for (long i = 0; i < Lq; ++i) {
        u64 qi = q[i], pi = qpinv[i], r2 = qr2[i];
        for (long j = 0; j < n; ++j) {
            long o = i * n + j;
            u64 a0m = mont_mul(a[o], r2, qi, pi);
            u64 a1m = mont_mul(a[Lq * n + o], r2, qi, pi);
            d[o] = mont_mul(a0m, b[o], qi, pi);
            d[Lq * n + o] = addmod(mont_mul(a0m, b[Lq * n + o], qi, pi),
                                   mont_mul(a1m, b[o], qi, pi), qi);
            d[2 * Lq * n + o] = mont_mul(a1m, b[Lq * n + o], qi, pi);
        }
    }
    std::memcpy(c2.data(), d.data() + 2 * Lq * n, Lq * n * sizeof(u64));
    ntt_inv(c2.data(), P.u(B_QIPSI), P.u(B_QIPSI_SH), P.u(B_QNINV),
            P.u(B_QNINV_SH), q, Lq, n);
    key_switch(P, c2.data(), rlk, e0.data(), e1.data(), S);
    // e back to NTT domain (output_ntt=True path), add, then rescale
    ntt_fwd(e0.data(), P.u(B_QPSI), P.u(B_QPSI_SH), q, Lq, n);
    ntt_fwd(e1.data(), P.u(B_QPSI), P.u(B_QPSI_SH), q, Lq, n);
    std::vector<u64> cc(2 * Lq * n);
    for (long i = 0; i < Lq; ++i)
        for (long j = 0; j < n; ++j) {
            long o = i * n + j;
            cc[o] = addmod(d[o], e0[o], q[i]);
            cc[Lq * n + o] = addmod(d[Lq * n + o], e1[o], q[i]);
        }
    // rescale: INTT over Lq, DivRoundLast, NTT over Lq-1
    ntt_inv(cc.data(), P.u(B_QIPSI), P.u(B_QIPSI_SH), P.u(B_QNINV),
            P.u(B_QNINV_SH), q, Lq, n);
    ntt_inv(cc.data() + Lq * n, P.u(B_QIPSI), P.u(B_QIPSI_SH), P.u(B_QNINV),
            P.u(B_QNINV_SH), q, Lq, n);
    const u64* ql_inv = P.u(B_RS_QLINV_MONT);  // (Lq-1)
    const u64 q_last_half = P.u(B_RS_SCAL)[0];
    long Lr = Lq - 1;
    for (int c = 0; c < 2; ++c) {
        const u64* src = cc.data() + c * Lq * n;
        const u64* last = src + Lr * n;
        u64* dst = out + c * Lr * n;
        for (long i = 0; i < Lr; ++i) {
            u64 qi = q[i], pi = qpinv[i];
            for (long j = 0; j < n; ++j) {
                u64 aa = mont_mul(last[j], ql_inv[i], qi, pi);
                u64 bb = mont_mul(src[i * n + j], ql_inv[i], qi, pi);
                u64 delta = last[j] >= q_last_half ? 1 : 0;
                dst[i * n + j] = addmod(submod(bb, aa, qi), delta, qi);
            }
        }
        ntt_fwd(out + c * Lr * n, P.u(B_QPSI), P.u(B_QPSI_SH), q, Lr, n);
    }
}

// ---- threaded bench drivers ---------------------------------------------
// Run n_ops independent ops over n_threads; returns wall seconds. Inputs
// shared read-only (flatters the host cache — conservative for the chip's
// vs_baseline). out receives op 0's result for validation.

static double now_s() {
    return std::chrono::duration<double>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

double ls_bfv_mult_relin_bench(void* const* bufs, const i64* dims, const u64* a,
                               const u64* b, const u64* rlk, u64* out,
                               i64 n_ops, i64 n_threads) {
    Pool P(bufs, dims);
    double t0 = now_s();
#pragma omp parallel num_threads((int)n_threads)
    {
        Scratch S;
        S.ensure(scratch_words(P));
        std::vector<u64> res(2 * P.Lq * P.n);
        std::vector<u64> d3(3 * P.Lq * P.n), e0(P.Lq * P.n), e1(P.Lq * P.n);
#pragma omp for schedule(dynamic)
        for (i64 op = 0; op < n_ops; ++op) {
            S.reset();
            behz_mult(P, a, b, d3.data(), S);
            S.reset();
            key_switch(P, d3.data() + 2 * P.Lq * P.n, rlk, e0.data(), e1.data(), S);
            for (long i = 0; i < P.Lq; ++i)
                for (long j = 0; j < P.n; ++j) {
                    long o = i * P.n + j;
                    res[o] = addmod(d3[o], e0[o], P.u(B_Q)[i]);
                    res[P.Lq * P.n + o] =
                        addmod(d3[P.Lq * P.n + o], e1[o], P.u(B_Q)[i]);
                }
            if (op == 0) std::memcpy(out, res.data(), res.size() * sizeof(u64));
        }
    }
    return now_s() - t0;
}

double ls_bfv_rotate_bench(void* const* bufs, const i64* dims, const u64* ct,
                           const u64* autom_src, const u64* autom_sign,
                           const u64* glk, u64* out, i64 n_ops, i64 n_threads) {
    double t0 = now_s();
#pragma omp parallel for schedule(dynamic) num_threads((int)n_threads)
    for (i64 op = 0; op < n_ops; ++op) {
        Pool P(bufs, dims);
        std::vector<u64> res(2 * P.Lq * P.n);
        ls_bfv_rotate(bufs, dims, ct, autom_src, autom_sign, glk, res.data());
        if (op == 0) std::memcpy(out, res.data(), res.size() * sizeof(u64));
    }
    return now_s() - t0;
}

double ls_ckks_mult_relin_rescale_bench(void* const* bufs, const i64* dims,
                                        const u64* a, const u64* b,
                                        const u64* rlk, u64* out, i64 n_ops,
                                        i64 n_threads) {
    double t0 = now_s();
#pragma omp parallel for schedule(dynamic) num_threads((int)n_threads)
    for (i64 op = 0; op < n_ops; ++op) {
        Pool P(bufs, dims);
        std::vector<u64> res(2 * (P.Lq - 1) * P.n);
        ls_ckks_mult_relin_rescale(bufs, dims, a, b, rlk, res.data());
        if (op == 0) std::memcpy(out, res.data(), res.size() * sizeof(u64));
    }
    return now_s() - t0;
}

}  // extern "C"
