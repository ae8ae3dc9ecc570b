// Native double-precision reference simulator + QASM front-end.
//
// The TPU-native framework's ground-truth twin, mirroring the semantics of
// the reference CPU program (/root/reference/quantum_simulator.c):
//   - gate set cx, x, sx, z, s, sdg, t, tdg, rz(theta), h  (:182-211)
//   - little-endian qubit convention (mask = 1<<target, :83)
//   - rz(theta) == diag(1, e^{i theta}) phase convention (:205-208)
//   - cumulative distribution + inverse-CDF sampling (:256-283)
//
// Unlike that program (scalar loop over all 2^n indices per gate even though
// half do no work, :84-91) the hot loops here iterate only the 2^(n-1)
// butterfly pairs and parallelize with OpenMP.
//
// C ABI, consumed from Python via ctypes (ref/native.py).  Build: csrc/Makefile.

#include <cctype>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <vector>

using cplx = std::complex<double>;

namespace {

thread_local std::string g_error;

// Opcode order must match ref/native.py _OPCODES.
enum Opcode : int {
  OP_CX = 0, OP_ID, OP_X, OP_SX, OP_Z, OP_S, OP_SDG, OP_T, OP_TDG, OP_RZ, OP_H
};

struct Gate {
  cplx u[4];     // row-major 2x2; unused for cx
  int target;    // target qubit
  int control;   // -1 unless cx
  int opcode;    // Opcode
  double param;  // rz angle
};

struct Circuit {
  int num_qubits = 0;
  std::vector<Gate> gates;
};

// ---------------------------------------------------------------- expression
// Tiny recursive-descent evaluator for rz parameters: floats, pi/tau/e,
// + - * / and parentheses (qiskit emits forms like "rz(-3*pi/4)").
struct ExprParser {
  const char* p;
  bool ok = true;

  double parse() {
    double v = expr();
    skip();
    if (*p != '\0') ok = false;
    return v;
  }
  void skip() { while (*p == ' ' || *p == '\t') ++p; }
  double expr() {
    double v = term();
    for (;;) {
      skip();
      if (*p == '+') { ++p; v += term(); }
      else if (*p == '-') { ++p; v -= term(); }
      else return v;
    }
  }
  double term() {
    double v = unary();
    for (;;) {
      skip();
      if (*p == '*') { ++p; v *= unary(); }
      else if (*p == '/') { ++p; v /= unary(); }
      else return v;
    }
  }
  double unary() {
    skip();
    if (*p == '-') { ++p; return -unary(); }
    if (*p == '+') { ++p; return unary(); }
    return atom();
  }
  double atom() {
    skip();
    if (*p == '(') {
      ++p;
      double v = expr();
      skip();
      if (*p == ')') ++p; else ok = false;
      return v;
    }
    if (std::isalpha((unsigned char)*p)) {
      std::string name;
      while (std::isalnum((unsigned char)*p)) name += *p++;
      if (name == "pi") return M_PI;
      if (name == "tau") return 2.0 * M_PI;
      if (name == "e") return M_E;
      ok = false;
      return 0.0;
    }
    char* end = nullptr;
    double v = std::strtod(p, &end);
    if (end == p) { ok = false; return 0.0; }
    p = end;
    return v;
  }
};

// ---------------------------------------------------------------- front-end
const double kSqrt1_2 = 0.7071067811865475244008443621048490;

bool gate_matrix_1q(const std::string& name, double param, cplx u[4], int* opcode) {
  if (name == "id") { *opcode = OP_ID; u[0] = 1; u[1] = 0; u[2] = 0; u[3] = 1; }
  else if (name == "x") { *opcode = OP_X; u[0] = 0; u[1] = 1; u[2] = 1; u[3] = 0; }
  else if (name == "sx") {
    *opcode = OP_SX;
    u[0] = cplx(0.5, 0.5); u[1] = cplx(0.5, -0.5);
    u[2] = cplx(0.5, -0.5); u[3] = cplx(0.5, 0.5);
  } else if (name == "z") { *opcode = OP_Z; u[0] = 1; u[1] = 0; u[2] = 0; u[3] = -1; }
  else if (name == "s") { *opcode = OP_S; u[0] = 1; u[1] = 0; u[2] = 0; u[3] = cplx(0, 1); }
  else if (name == "sdg") { *opcode = OP_SDG; u[0] = 1; u[1] = 0; u[2] = 0; u[3] = cplx(0, -1); }
  else if (name == "t") { *opcode = OP_T; u[0] = 1; u[1] = 0; u[2] = 0; u[3] = std::polar(1.0, M_PI / 4); }
  else if (name == "tdg") { *opcode = OP_TDG; u[0] = 1; u[1] = 0; u[2] = 0; u[3] = std::polar(1.0, -M_PI / 4); }
  else if (name == "rz") { *opcode = OP_RZ; u[0] = 1; u[1] = 0; u[2] = 0; u[3] = std::polar(1.0, param); }
  else if (name == "h") { *opcode = OP_H; u[0] = kSqrt1_2; u[1] = kSqrt1_2; u[2] = kSqrt1_2; u[3] = -kSqrt1_2; }
  else return false;
  return true;
}

void strip_comments(std::string& s) {
  std::string out;
  out.reserve(s.size());
  for (size_t i = 0; i < s.size(); ++i) {
    if (s[i] == '/' && i + 1 < s.size() && s[i + 1] == '/') {
      while (i < s.size() && s[i] != '\n') ++i;
      if (i < s.size()) out += '\n';
    } else {
      out += s[i];
    }
  }
  s.swap(out);
}

bool starts_with(const std::string& s, const char* prefix) {
  return s.rfind(prefix, 0) == 0;
}

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

Circuit* parse_text(const std::string& text_in) {
  std::string text = text_in;
  strip_comments(text);
  auto circ = new Circuit();
  bool have_reg = false;

  size_t pos = 0;
  while (pos < text.size()) {
    size_t semi = text.find(';', pos);
    std::string stmt = trim(text.substr(pos, semi == std::string::npos
                                                 ? std::string::npos
                                                 : semi - pos));
    pos = (semi == std::string::npos) ? text.size() : semi + 1;
    if (stmt.empty()) continue;
    if (starts_with(stmt, "OPENQASM") || starts_with(stmt, "include") ||
        starts_with(stmt, "barrier") || starts_with(stmt, "creg") ||
        starts_with(stmt, "bit") || starts_with(stmt, "measure") ||
        starts_with(stmt, "reset"))
      continue;

    if (starts_with(stmt, "qubit") || starts_with(stmt, "qreg")) {
      // qubit[n] q  |  qubit q[n]  |  qreg q[n]
      if (have_reg) { g_error = "multiple quantum registers"; delete circ; return nullptr; }
      size_t lb = stmt.find('[');
      if (lb == std::string::npos) { g_error = "register without size: " + stmt; delete circ; return nullptr; }
      circ->num_qubits = std::atoi(stmt.c_str() + lb + 1);
      if (circ->num_qubits < 1) { g_error = "bad register size: " + stmt; delete circ; return nullptr; }
      have_reg = true;
      continue;
    }

    // gate statement: name(params)? reg[i](, reg[j])*
    size_t i = 0;
    std::string name;
    while (i < stmt.size() && (std::isalnum((unsigned char)stmt[i]) || stmt[i] == '_'))
      name += std::tolower((unsigned char)stmt[i++]);
    if (name.empty()) { g_error = "cannot parse statement: " + stmt; delete circ; return nullptr; }
    if (!have_reg) { g_error = "gate '" + name + "' before register declaration"; delete circ; return nullptr; }

    double param = 0.0;
    while (i < stmt.size() && std::isspace((unsigned char)stmt[i])) ++i;
    if (i < stmt.size() && stmt[i] == '(') {
      size_t close = stmt.find(')', i);
      if (close == std::string::npos) { g_error = "unbalanced ( in: " + stmt; delete circ; return nullptr; }
      std::string expr = stmt.substr(i + 1, close - i - 1);
      ExprParser ep{expr.c_str()};
      param = ep.parse();
      if (!ep.ok) { g_error = "bad parameter '" + expr + "'"; delete circ; return nullptr; }
      i = close + 1;
    }

    // operands
    std::vector<int> qubits;
    while (i < stmt.size()) {
      size_t lb = stmt.find('[', i);
      if (lb == std::string::npos) break;
      int q = std::atoi(stmt.c_str() + lb + 1);
      qubits.push_back(q);
      size_t rb = stmt.find(']', lb);
      if (rb == std::string::npos) { g_error = "unbalanced [ in: " + stmt; delete circ; return nullptr; }
      i = rb + 1;
    }
    for (int q : qubits)
      if (q < 0 || q >= circ->num_qubits) {
        g_error = "qubit index out of range in: " + stmt; delete circ; return nullptr;
      }

    Gate g{};
    g.param = param;
    if (name == "cx") {
      if (qubits.size() != 2 || qubits[0] == qubits[1]) {
        g_error = "cx needs two distinct qubits: " + stmt; delete circ; return nullptr;
      }
      g.opcode = OP_CX;
      g.control = qubits[0];
      g.target = qubits[1];
    } else {
      if (!gate_matrix_1q(name, param, g.u, &g.opcode)) {
        g_error = "unknown gate '" + name + "'"; delete circ; return nullptr;
      }
      if (qubits.size() != 1) {
        g_error = name + " needs one qubit: " + stmt; delete circ; return nullptr;
      }
      g.control = -1;
      g.target = qubits[0];
    }
    circ->gates.push_back(g);
  }
  if (!have_reg) { g_error = "no qubit register declaration found"; delete circ; return nullptr; }
  return circ;
}

// ---------------------------------------------------------------- simulator
void apply_1q(cplx* v, int n, const cplx u[4], int k) {
  const int64_t half = int64_t(1) << (n - 1);
  const int64_t low = int64_t(1) << k;
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < half; ++t) {
    // bit-insertion pair indexing (ref: quantum_simulator_naive.cu:79-80)
    const int64_t i0 = ((t >> k) << (k + 1)) | (t & (low - 1));
    const int64_t i1 = i0 | low;
    const cplx a = v[i0], b = v[i1];
    v[i0] = a * u[0] + b * u[1];
    v[i1] = a * u[2] + b * u[3];
  }
}

void apply_cnot(cplx* v, int n, int control, int target) {
  const int64_t quarter = int64_t(1) << (n - 2);
  const int lo = control < target ? control : target;
  const int hi = control < target ? target : control;
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < quarter; ++t) {
    // two-bit insertion (ref: quantum_simulator_naive.cu:107)
    int64_t i = t;
    i = ((i >> lo) << (lo + 1)) | (i & ((int64_t(1) << lo) - 1));
    i = ((i >> hi) << (hi + 1)) | (i & ((int64_t(1) << hi) - 1));
    const int64_t i_c = i | (int64_t(1) << control);        // control set, target 0
    const int64_t i_ct = i_c | (int64_t(1) << target);      // both set
    std::swap(v[i_c], v[i_ct]);
  }
}

}  // namespace

extern "C" {

const char* qsr_error() { return g_error.c_str(); }

void* qsr_parse_file(const char* path) {
  g_error.clear();
  FILE* f = std::fopen(path, "rb");
  if (!f) { g_error = std::string("cannot open circuit file: ") + path; return nullptr; }
  std::string text;
  char buf[1 << 16];
  size_t got;
  while ((got = std::fread(buf, 1, sizeof buf, f)) > 0) text.append(buf, got);
  std::fclose(f);
  return parse_text(text);
}

void* qsr_parse_string(const char* text) {
  g_error.clear();
  return parse_text(text);
}

int qsr_num_qubits(void* h) { return static_cast<Circuit*>(h)->num_qubits; }
int64_t qsr_num_gates(void* h) {
  return (int64_t) static_cast<Circuit*>(h)->gates.size();
}

// Fill caller-allocated SoA arrays (the reference's parse_circuit layout,
// quantum_simulator_naive.cu:224-402: 4 re + 4 im doubles per gate, target,
// control with -1 instead of the 127 sentinel).
void qsr_gates(void* h, double* u_re, double* u_im, int* target, int* control,
               int* opcode, double* param) {
  auto* c = static_cast<Circuit*>(h);
  for (size_t g = 0; g < c->gates.size(); ++g) {
    for (int j = 0; j < 4; ++j) {
      u_re[4 * g + j] = c->gates[g].u[j].real();
      u_im[4 * g + j] = c->gates[g].u[j].imag();
    }
    target[g] = c->gates[g].target;
    control[g] = c->gates[g].control;
    opcode[g] = c->gates[g].opcode;
    param[g] = c->gates[g].param;
  }
}

void qsr_free(void* h) { delete static_cast<Circuit*>(h); }

// Simulate into caller buffers out_re/out_im of length 2^n. Returns 0 on ok.
int qsr_simulate(void* h, double* out_re, double* out_im) {
  auto* c = static_cast<Circuit*>(h);
  const int n = c->num_qubits;
  const int64_t size = int64_t(1) << n;
  std::vector<cplx> v(size, cplx(0, 0));
  v[0] = 1.0;
  for (const Gate& g : c->gates) {
    if (g.control >= 0)
      apply_cnot(v.data(), n, g.control, g.target);
    else
      apply_1q(v.data(), n, g.u, g.target);
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < size; ++i) {
    out_re[i] = v[i].real();
    out_im[i] = v[i].imag();
  }
  return 0;
}

// Inverse-CDF sampling (ref: quantum_simulator.c:256-283), deterministic PRNG.
void qsr_sample(const double* re, const double* im, int num_q,
                uint64_t seed, int64_t* out, int64_t num_samples) {
  const int64_t size = int64_t(1) << num_q;
  std::vector<double> cumul(size);
  double acc = 0.0;
  for (int64_t i = 0; i < size; ++i) {
    acc += re[i] * re[i] + im[i] * im[i];
    cumul[i] = acc;
  }
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> dist(0.0, acc);
  for (int64_t s = 0; s < num_samples; ++s) {
    const double u = dist(rng);
    int64_t lo = 0, hi = size - 1;
    while (lo < hi) {  // lower_bound
      const int64_t mid = (lo + hi) / 2;
      if (cumul[mid] < u) lo = mid + 1; else hi = mid;
    }
    out[s] = lo;
  }
}

}  // extern "C"
