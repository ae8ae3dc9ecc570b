// Native circuit-fusion pipeline: the host-side circuit compiler.
//
// Implements the same passes as passes/fuse4x4.py + passes/fuse_k.py —
// the reference's 4x4 pairing state machine (quantum_simulator_4x4.cu:327-469)
// generalized to k-qubit dense blocks — in C++ with SoA split re/im block
// storage so the inner butterflies autovectorize.  The Python passes remain
// the semantic ground truth; this library exists because per-run fusion is
// inside the benchmark's timed region (the reference re-preprocesses each
// run too) and numpy spends ~150 ms where this spends ~10.
//
// C ABI consumed by passes/native_fuse.py via ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kMaxWidth = 10;  // 2^10 = 1024 block dim upper bound

struct Block {
  int width = 0;
  int qubits[kMaxWidth];            // sorted ascending
  std::vector<double> re, im;       // dim*dim row-major, dim = 1<<width
  int dim() const { return 1 << width; }

  int bit_of(int q) const {
    for (int i = 0; i < width; ++i)
      if (qubits[i] == q) return i;
    return -1;
  }
};

struct FuseState {
  int n = 0;
  int max_qubits = 7;
  int max_low = -1;        // -1 = cap TOTAL width by max_qubits (legacy);
                           // >=0 = cap low (< high_threshold) qubits by
                           // max_low and high qubits by max_high SEPARATELY.
                           // The wide engine expands every block over the
                           // full lane superset anyway (engine/wide.py
                           // _op_spec), so a 7-low + kh-high block costs
                           // exactly the same as a 1-low + kh-high block —
                           // the split cap packs more gates per block for
                           // free.
  int max_high = -1;       // -1 = unlimited
  int high_threshold = 7;
  std::vector<double> kh_costs;  // per-block cost by kh class (empty = off)
  std::vector<Block> out;
};

bool is_identity(const Block& b, double tol = 1e-12) {
  const int d = b.dim();
  for (int r = 0; r < d; ++r)
    for (int c = 0; c < d; ++c) {
      const double er = b.re[r * d + c] - (r == c ? 1.0 : 0.0);
      const double ei = b.im[r * d + c];
      if (std::fabs(er) > tol || std::fabs(ei) > tol) return false;
    }
  return true;
}

// Insert a new qubit q into the block (identity action), doubling dim.
void grow(Block& b, int q) {
  int pos = 0;
  while (pos < b.width && b.qubits[pos] < q) ++pos;
  const int d = b.dim(), nd = d << 1;
  std::vector<double> nre(size_t(nd) * nd, 0.0), nim(size_t(nd) * nd, 0.0);
  const int low_mask = (1 << pos) - 1;
  for (int r = 0; r < d; ++r) {
    const int r0 = ((r & ~low_mask) << 1) | (r & low_mask);
    for (int bit = 0; bit < 2; ++bit) {
      const int nr = r0 | (bit << pos);
      double* dst_re = &nre[size_t(nr) * nd];
      double* dst_im = &nim[size_t(nr) * nd];
      const double* src_re = &b.re[size_t(r) * d];
      const double* src_im = &b.im[size_t(r) * d];
      for (int c = 0; c < d; ++c) {
        const int c0 = ((c & ~low_mask) << 1) | (c & low_mask);
        const int nc = c0 | (bit << pos);
        dst_re[nc] = src_re[c];
        dst_im[nc] = src_im[c];
      }
    }
  }
  for (int i = b.width; i > pos; --i) b.qubits[i] = b.qubits[i - 1];
  b.qubits[pos] = q;
  b.width += 1;
  b.re.swap(nre);
  b.im.swap(nim);
}

// Left-multiply a 1q gate (row-major 2x2 split) acting on block bit `bit`.
void absorb_1q(Block& b, int bit, const double ur[4], const double ui[4]) {
  const int d = b.dim();
  const int stride = 1 << bit;
  for (int base = 0; base < d; base += stride << 1) {
    for (int off = 0; off < stride; ++off) {
      double* r0re = &b.re[size_t(base + off) * d];
      double* r0im = &b.im[size_t(base + off) * d];
      double* r1re = &b.re[size_t(base + off + stride) * d];
      double* r1im = &b.im[size_t(base + off + stride) * d];
      for (int c = 0; c < d; ++c) {
        const double a_re = r0re[c], a_im = r0im[c];
        const double bb_re = r1re[c], bb_im = r1im[c];
        r0re[c] = ur[0] * a_re - ui[0] * a_im + ur[1] * bb_re - ui[1] * bb_im;
        r0im[c] = ur[0] * a_im + ui[0] * a_re + ur[1] * bb_im + ui[1] * bb_re;
        r1re[c] = ur[2] * a_re - ui[2] * a_im + ur[3] * bb_re - ui[3] * bb_im;
        r1im[c] = ur[2] * a_im + ui[2] * a_re + ur[3] * bb_im + ui[3] * bb_re;
      }
    }
  }
}

// Left-multiply a 4x4 gate on block bits (bl, bh) — pair basis
// index = bit(bh)*2 + bit(bl), matching ir.gates conventions.
void absorb_2q(Block& b, int bl, int bh, const double ur[16], const double ui[16]) {
  const int d = b.dim();
  const int ml = 1 << bl, mh = 1 << bh;
  for (int r = 0; r < d; ++r) {
    if (r & (ml | mh)) continue;  // visit each group once via its base row
    double* rr[4];
    double* ri[4];
    for (int p = 0; p < 4; ++p) {
      const int row = r | ((p & 1) ? ml : 0) | ((p & 2) ? mh : 0);
      rr[p] = &b.re[size_t(row) * d];
      ri[p] = &b.im[size_t(row) * d];
    }
    for (int c = 0; c < d; ++c) {
      double vre[4], vim[4];
      for (int p = 0; p < 4; ++p) {
        vre[p] = rr[p][c];
        vim[p] = ri[p][c];
      }
      for (int p = 0; p < 4; ++p) {
        double accr = 0.0, acci = 0.0;
        for (int q2 = 0; q2 < 4; ++q2) {
          const double mr = ur[p * 4 + q2], mi = ui[p * 4 + q2];
          accr += mr * vre[q2] - mi * vim[q2];
          acci += mr * vim[q2] + mi * vre[q2];
        }
        rr[p][c] = accr;
        ri[p][c] = acci;
      }
    }
  }
}

// ------------------------------------------------------------- 4x4 stage
struct Acc1 {
  bool active = false;
  double re[4], im[4];  // row-major 2x2
};

struct Pair4 {
  int lo = -1, hi = -1;
  double re[16], im[16];
};

const double CNOT_CLOW_RE[16] = {1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0};
const double CNOT_CHIGH_RE[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0};

void mm4(const double ar[16], const double ai[16], const double br[16],
         const double bi[16], double cr[16], double ci[16]) {
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) {
      double sr = 0, si = 0;
      for (int k = 0; k < 4; ++k) {
        sr += ar[r * 4 + k] * br[k * 4 + c] - ai[r * 4 + k] * bi[k * 4 + c];
        si += ar[r * 4 + k] * bi[k * 4 + c] + ai[r * 4 + k] * br[k * 4 + c];
      }
      cr[r * 4 + c] = sr;
      ci[r * 4 + c] = si;
    }
}

struct Emitter;  // fwd

// k-fusion consumer of the 4x4 stage's output stream.
//
// Keeps a WINDOW of open blocks: an incoming op may be absorbed into an
// older block B_i when its qubit support is disjoint from every block newer
// than B_i (disjoint support => the op commutes past them), which packs
// far more gates per block on wide circuits than single-block chaining.
// Blocks are emitted in open order, so the product of the emitted list
// equals the original gate stream.
struct Emitter {
  FuseState* st;
  std::vector<Block> blocks;  // open blocks, oldest first
  int window = 4;

  static bool fits(const FuseState* st, const Block& b, const int* qs, int w) {
    int extra = 0, high = 0, low = 0;
    for (int i = 0; i < b.width; ++i)
      if (b.qubits[i] >= st->high_threshold) ++high; else ++low;
    for (int i = 0; i < w; ++i) {
      if (b.bit_of(qs[i]) < 0) {
        ++extra;
        if (qs[i] >= st->high_threshold) ++high; else ++low;
      }
    }
    if (st->max_low >= 0) {
      if (low > st->max_low) return false;
      if (b.width + extra > kMaxWidth) return false;
    } else if (b.width + extra > st->max_qubits) {
      return false;
    }
    if (st->max_high >= 0 && high > st->max_high) return false;
    return true;
  }

  // kh of the block after absorbing the op (current high count + new highs).
  static int kh_after(const FuseState* st, const Block& b, const int* qs, int w) {
    int high = 0;
    for (int i = 0; i < b.width; ++i)
      if (b.qubits[i] >= st->high_threshold) ++high;
    for (int i = 0; i < w; ++i)
      if (b.bit_of(qs[i]) < 0 && qs[i] >= st->high_threshold) ++high;
    return high;
  }

  double khcost(int kh) const {
    const std::vector<double>& c = st->kh_costs;
    const size_t i = (size_t)kh < c.size() ? (size_t)kh : c.size() - 1;
    return c[i];
  }

  static bool disjoint(const Block& b, const int* qs, int w) {
    for (int i = 0; i < w; ++i)
      if (b.bit_of(qs[i]) >= 0) return false;
    return true;
  }

  void emit(const Block& b) {
    if (!is_identity(b)) st->out.push_back(b);
  }

  void flush() {
    for (const Block& b : blocks) emit(b);
    blocks.clear();
  }

  static void absorb(Block& b, const int* qs, int w, const double* ur,
                     const double* ui) {
    for (int i = 0; i < w; ++i)
      if (b.bit_of(qs[i]) < 0) grow(b, qs[i]);
    if (w == 1) {
      absorb_1q(b, b.bit_of(qs[0]), ur, ui);
    } else {
      const int a = qs[0] < qs[1] ? qs[0] : qs[1];
      const int b2 = qs[0] < qs[1] ? qs[1] : qs[0];
      absorb_2q(b, b.bit_of(a), b.bit_of(b2), ur, ui);
    }
  }

  void push(const int* qs, int w, const double* ur, const double* ui) {
    if (!st->kh_costs.empty()) {
      // Cost-model selection (docs/PERFORMANCE.md kh roofline table): the
      // wide engine's per-block cost depends only on the kh class, so among
      // the commutation-reachable candidates pick the one whose kh rises
      // the least — and refuse absorbs costlier than opening a fresh block
      // (a window-8 first-fit measured SLOWER than window-1 because packing
      // shifted the kh mix toward D=512 blocks).
      int best = -1;
      double best_delta = 0.0;
      for (int i = (int)blocks.size() - 1; i >= 0; --i) {
        if (fits(st, blocks[i], qs, w)) {
          int kh0 = 0;
          for (int j = 0; j < blocks[i].width; ++j)
            if (blocks[i].qubits[j] >= st->high_threshold) ++kh0;
          const double d = khcost(kh_after(st, blocks[i], qs, w)) - khcost(kh0);
          if (best < 0 || d < best_delta - 1e-12) {
            best = i;
            best_delta = d;
          }
        }
        if (!disjoint(blocks[i], qs, w)) break;
      }
      if (best >= 0) {
        int op_high = 0;
        for (int i = 0; i < w; ++i)
          if (qs[i] >= st->high_threshold) ++op_high;
        if (best_delta <= khcost(op_high) + 1e-12) {
          absorb(blocks[best], qs, w, ur, ui);
          return;
        }
      }
    } else {
      // newest -> oldest; absorb into the first candidate the op can reach
      for (int i = (int)blocks.size() - 1; i >= 0; --i) {
        if (fits(st, blocks[i], qs, w)) {
          absorb(blocks[i], qs, w, ur, ui);
          return;
        }
        if (!disjoint(blocks[i], qs, w)) break;  // cannot commute past B_i
      }
    }
    Block b;
    b.width = 0;
    b.re.assign(1, 1.0);
    b.im.assign(1, 0.0);
    absorb(b, qs, w, ur, ui);
    blocks.push_back(std::move(b));
    if ((int)blocks.size() > window) {
      emit(blocks.front());
      blocks.erase(blocks.begin());
    }
  }
};

struct Pipeline {
  FuseState st;
  Emitter em;
  std::vector<Acc1> acc1;
  std::vector<int> partner;
  std::vector<Pair4> pair_of;  // indexed by min qubit of the pair
  std::vector<double> zero16 = std::vector<double>(16, 0.0);

  void init(int n, int max_q, int max_high, int high_thr) {
    st.n = n;
    st.max_qubits = max_q;
    st.max_high = max_high;
    st.high_threshold = high_thr;
    st.max_low = -1;
    st.kh_costs.clear();
    em.st = &st;
    acc1.assign(n, Acc1());
    partner.assign(n, -1);
    pair_of.assign(n, Pair4());
  }

  void flush_single(int q) {
    if (!acc1[q].active) return;
    // identity check
    const double* r = acc1[q].re;
    const double* i2 = acc1[q].im;
    const bool ident = std::fabs(r[0] - 1) < 1e-12 && std::fabs(r[3] - 1) < 1e-12 &&
                       std::fabs(r[1]) < 1e-12 && std::fabs(r[2]) < 1e-12 &&
                       std::fabs(i2[0]) < 1e-12 && std::fabs(i2[1]) < 1e-12 &&
                       std::fabs(i2[2]) < 1e-12 && std::fabs(i2[3]) < 1e-12;
    if (!ident) {
      int qs[1] = {q};
      em.push(qs, 1, acc1[q].re, acc1[q].im);
    }
    acc1[q].active = false;
  }

  void flush_pair(int q) {
    const int p = partner[q];
    if (p < 0) return;
    const int lo = q < p ? q : p;
    const int hi = q < p ? p : q;
    Pair4& pr = pair_of[lo];
    // identity check on the 4x4
    bool ident = true;
    for (int rr = 0; rr < 16 && ident; ++rr) {
      const double want = (rr % 5 == 0) ? 1.0 : 0.0;
      if (std::fabs(pr.re[rr] - want) > 1e-12 || std::fabs(pr.im[rr]) > 1e-12)
        ident = false;
    }
    if (!ident) {
      int qs[2] = {lo, hi};
      em.push(qs, 2, pr.re, pr.im);
    }
    partner[lo] = partner[hi] = -1;
  }

  void fold_1q(int q, const double ur[4], const double ui[4]) {
    const int p = partner[q];
    if (p < 0) {
      Acc1& a = acc1[q];
      if (!a.active) {
        a.active = true;
        a.re[0] = a.re[3] = 1.0;
        a.re[1] = a.re[2] = 0.0;
        a.im[0] = a.im[1] = a.im[2] = a.im[3] = 0.0;
      }
      // a = u @ a (2x2)
      double nr[4], ni[4];
      for (int r = 0; r < 2; ++r)
        for (int c = 0; c < 2; ++c) {
          double sr = 0, si = 0;
          for (int k = 0; k < 2; ++k) {
            sr += ur[r * 2 + k] * a.re[k * 2 + c] - ui[r * 2 + k] * a.im[k * 2 + c];
            si += ur[r * 2 + k] * a.im[k * 2 + c] + ui[r * 2 + k] * a.re[k * 2 + c];
          }
          nr[r * 2 + c] = sr;
          ni[r * 2 + c] = si;
        }
      std::memcpy(a.re, nr, sizeof nr);
      std::memcpy(a.im, ni, sizeof ni);
      return;
    }
    // folded into the 4x4: expand u over the pair and left-multiply
    const int lo = q < p ? q : p;
    Pair4& pr = pair_of[lo];
    double er[16] = {0}, ei[16] = {0};
    const bool q_is_low = (q == lo);
    for (int bo = 0; bo < 2; ++bo)       // other qubit bit (unchanged)
      for (int r = 0; r < 2; ++r)
        for (int c = 0; c < 2; ++c) {
          int row, col;
          if (q_is_low) {
            row = bo * 2 + r;
            col = bo * 2 + c;
          } else {
            row = r * 2 + bo;
            col = c * 2 + bo;
          }
          er[row * 4 + col] = ur[r * 2 + c];
          ei[row * 4 + col] = ui[r * 2 + c];
        }
    double nr[16], ni[16];
    mm4(er, ei, pr.re, pr.im, nr, ni);
    std::memcpy(pr.re, nr, sizeof nr);
    std::memcpy(pr.im, ni, sizeof ni);
  }

  void push_cx(int c, int t) {
    const int lo = c < t ? c : t;
    const int hi = c < t ? t : c;
    const double* cn_re = (c < t) ? CNOT_CLOW_RE : CNOT_CHIGH_RE;

    if (partner[c] == t) {  // same pair again
      Pair4& pr = pair_of[lo];
      double nr[16], ni[16];
      mm4(cn_re, zero16.data(), pr.re, pr.im, nr, ni);
      std::memcpy(pr.re, nr, sizeof nr);
      std::memcpy(pr.im, ni, sizeof ni);
      return;
    }
    flush_pair(c);
    flush_pair(t);

    // seed 4x4 = CNOT @ (acc_hi (x) acc_lo)
    double kr[16], ki[16];
    const Acc1& alo = acc1[lo];
    const Acc1& ahi = acc1[hi];
    double lr[4] = {1, 0, 0, 1}, li[4] = {0, 0, 0, 0};
    double hr[4] = {1, 0, 0, 1}, hi4[4] = {0, 0, 0, 0};
    if (alo.active) {
      std::memcpy(lr, alo.re, sizeof lr);
      std::memcpy(li, alo.im, sizeof li);
    }
    if (ahi.active) {
      std::memcpy(hr, ahi.re, sizeof hr);
      std::memcpy(hi4, ahi.im, sizeof hi4);
    }
    acc1[lo].active = acc1[hi].active = false;
    // kron(hi, lo): index = bit_hi*2 + bit_lo
    for (int rh = 0; rh < 2; ++rh)
      for (int rl = 0; rl < 2; ++rl)
        for (int ch = 0; ch < 2; ++ch)
          for (int cl = 0; cl < 2; ++cl) {
            const int row = rh * 2 + rl, col = ch * 2 + cl;
            kr[row * 4 + col] = hr[rh * 2 + ch] * lr[rl * 2 + cl] -
                                hi4[rh * 2 + ch] * li[rl * 2 + cl];
            ki[row * 4 + col] = hr[rh * 2 + ch] * li[rl * 2 + cl] +
                                hi4[rh * 2 + ch] * lr[rl * 2 + cl];
          }
    Pair4& pr = pair_of[lo];
    mm4(cn_re, zero16.data(), kr, ki, pr.re, pr.im);
    pr.lo = lo;
    pr.hi = hi;
    partner[c] = t;
    partner[t] = c;
  }

  void finish() {
    for (int q = 0; q < st.n; ++q) {
      if (partner[q] >= 0) flush_pair(q);
      flush_single(q);
    }
    em.flush();
  }
};

thread_local std::string g_err;

}  // namespace

extern "C" {

const char* qsf_error() { return g_err.c_str(); }

// Run the full fusion pipeline over a SoA gate stream (the qsr_gates
// layout: 4 doubles re+im row-major per 1q gate; control >= 0 marks cx).
// Returns an opaque handle or null.
void* qsf_fuse(int num_qubits, long long num_gates, const double* u_re,
               const double* u_im, const int* target, const int* control,
               int max_qubits, int max_high, int high_threshold, int window) {
  g_err.clear();
  if (num_qubits < 1 || max_qubits < 2 || max_qubits > kMaxWidth || window < 1) {
    g_err = "bad arguments";
    return nullptr;
  }
  auto* p = new Pipeline();
  p->init(num_qubits, max_qubits, max_high, high_threshold);
  p->em.window = window;
  for (long long g = 0; g < num_gates; ++g) {
    if (control[g] >= 0)
      p->push_cx(control[g], target[g]);
    else
      p->fold_1q(target[g], &u_re[4 * g], &u_im[4 * g]);
  }
  p->finish();
  return p;
}

// v2: split low/high width caps + optional kh cost model.
//   max_low >= 0: cap low (< high_threshold) qubits by max_low and high
//   qubits by max_high, ignoring max_qubits (total still <= kMaxWidth).
//   kh_costs/num_costs: per-block cost by kh class for cost-aware absorb
//   candidate selection (null/0 = first-fit legacy behavior).
void* qsf_fuse2(int num_qubits, long long num_gates, const double* u_re,
                const double* u_im, const int* target, const int* control,
                int max_qubits, int max_low, int max_high, int high_threshold,
                int window, const double* kh_costs, int num_costs) {
  g_err.clear();
  if (num_qubits < 1 || max_qubits < 2 || max_qubits > kMaxWidth ||
      window < 1 || (max_low >= 0 && max_low < 2)) {
    g_err = "bad arguments";
    return nullptr;
  }
  auto* p = new Pipeline();
  p->init(num_qubits, max_qubits, max_high, high_threshold);
  p->st.max_low = max_low;
  if (kh_costs && num_costs > 0)
    p->st.kh_costs.assign(kh_costs, kh_costs + num_costs);
  p->em.window = window;
  for (long long g = 0; g < num_gates; ++g) {
    if (control[g] >= 0)
      p->push_cx(control[g], target[g]);
    else
      p->fold_1q(target[g], &u_re[4 * g], &u_im[4 * g]);
  }
  p->finish();
  return p;
}

long long qsf_num_ops(void* h) {
  return (long long) static_cast<Pipeline*>(h)->st.out.size();
}

int qsf_op_width(void* h, long long i) {
  return static_cast<Pipeline*>(h)->st.out[i].width;
}

void qsf_op_qubits(void* h, long long i, int* qubits) {
  const Block& b = static_cast<Pipeline*>(h)->st.out[i];
  for (int j = 0; j < b.width; ++j) qubits[j] = b.qubits[j];
}

// Fill caller buffer (dim*dim complex128 interleaved, numpy-compatible).
void qsf_op_matrix(void* h, long long i, double* interleaved) {
  const Block& b = static_cast<Pipeline*>(h)->st.out[i];
  const size_t d2 = size_t(b.dim()) * b.dim();
  for (size_t j = 0; j < d2; ++j) {
    interleaved[2 * j] = b.re[j];
    interleaved[2 * j + 1] = b.im[j];
  }
}

void qsf_destroy(void* h) { delete static_cast<Pipeline*>(h); }

}  // extern "C"
