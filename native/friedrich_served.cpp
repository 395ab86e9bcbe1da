// friedrich-tpu native serving daemon.
//
// Standalone CPU inference server around a trained GP model: loads a
// bundle exported by `friedrich_tpu.serving.export_bundle` (training
// inputs, prior residuals, Cholesky factor, kernel/prior spec) and
// serves posterior mean/variance over a length-prefixed binary TCP
// protocol. Fills the "runtime around the compute path" slot natively —
// the reference has no serving story at all (its API is the Rust library
// surface, lib.rs:39-45); this daemon plus the Python client in
// `friedrich_tpu/serving.py` is the deployment-facing equivalent.
//
// All kernel math lives in libfriedrich_native.so (single transcription
// of parameters/kernel.rs — no formula duplication here); this file is
// bundle parsing, the socket loop, and the composite-kernel predict
// assembly.
//
// Build (friedrich_tpu/serving.py does this on demand):
//   g++ -O3 -o friedrich_served friedrich_served.cpp \
//       -L. -lfriedrich_native -Wl,-rpath,'$ORIGIN'
//
// Run: friedrich_served <bundle> <port>   (binds 127.0.0.1)

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

// ---- libfriedrich_native.so surface (see friedrich_native.cpp) ----
extern "C" {
void cov_matrix(int kid, const double* params, const double* x1, int64_t n1,
                const double* x2, int64_t n2, int64_t d, double* out);
void cov_matrix2(int op, int kid1, const double* p1, int kid2,
                 const double* p2, const double* x1, int64_t n1,
                 const double* x2, int64_t n2, int64_t d, double* out);
void solve_lower(const double* l, double* b, int64_t n, int64_t m);
void solve_lower_t(const double* l, double* b, int64_t n, int64_t m);
void gp_predict_mean_var(int kid, const double* params, const double* x,
                         int64_t n, int64_t d, const double* l,
                         const double* resid, const double* xq, int64_t m,
                         double* work, double* mean_out, double* var_out);
}

namespace {

constexpr char kBundleMagic[8] = {'F', 'R', 'S', 'E', 'R', 'V', 'E', '1'};
constexpr uint32_t kReqMagic = 0x46525131;   // "FRQ1"
constexpr uint32_t kRespMagic = 0x46525231;  // "FRR1"
constexpr uint32_t kFlagVariance = 1u;
constexpr uint64_t kMaxBatch = 1u << 20;

enum PriorKind { PRIOR_ZERO = 0, PRIOR_CONSTANT = 1, PRIOR_LINEAR = 2 };

struct Model {
  int64_t op = 0;  // 0 single, 1 sum, 2 prod (CompositeOp)
  int64_t kid1 = 0, kid2 = 0;
  std::vector<double> p1, p2;
  int64_t prior_kind = PRIOR_ZERO;
  std::vector<double> prior_params;  // constant: [c]; linear: [w..., b]
  double noise = 0.0;
  int64_t n = 0, d = 0;
  std::vector<double> x, resid, l;
};

bool read_exact(FILE* f, void* dst, size_t bytes) {
  return std::fread(dst, 1, bytes, f) == bytes;
}

bool read_i64(FILE* f, int64_t* v) { return read_exact(f, v, 8); }

bool read_f64_vec(FILE* f, std::vector<double>* v, int64_t count) {
  if (count < 0) return false;
  v->resize(static_cast<size_t>(count));
  return count == 0 || read_exact(f, v->data(), 8 * count);
}

bool load_bundle(const char* path, Model* m) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char magic[8];
  bool ok = read_exact(f, magic, 8) && !std::memcmp(magic, kBundleMagic, 8);
  int64_t np1 = 0, np2 = 0, pnp = 0;
  ok = ok && read_i64(f, &m->op);
  ok = ok && read_i64(f, &m->kid1) && read_i64(f, &np1) &&
       read_f64_vec(f, &m->p1, np1);
  ok = ok && read_i64(f, &m->kid2) && read_i64(f, &np2) &&
       read_f64_vec(f, &m->p2, np2);
  ok = ok && read_i64(f, &m->prior_kind) && read_i64(f, &pnp) &&
       read_f64_vec(f, &m->prior_params, pnp);
  ok = ok && read_exact(f, &m->noise, 8);
  ok = ok && read_i64(f, &m->n) && read_i64(f, &m->d);
  ok = ok && m->n > 0 && m->d > 0;
  ok = ok && read_f64_vec(f, &m->x, m->n * m->d);
  ok = ok && read_f64_vec(f, &m->resid, m->n);
  ok = ok && read_f64_vec(f, &m->l, m->n * m->n);
  std::fclose(f);
  return ok;
}

void add_prior_mean(const Model& m, const double* xq, int64_t nq,
                    double* mean) {
  switch (m.prior_kind) {
    case PRIOR_ZERO:
      return;
    case PRIOR_CONSTANT:
      for (int64_t i = 0; i < nq; ++i) mean[i] += m.prior_params[0];
      return;
    case PRIOR_LINEAR:
      // params = [w_0..w_{d-1}, intercept]
      for (int64_t i = 0; i < nq; ++i) {
        double s = m.prior_params[m.d];
        for (int64_t k = 0; k < m.d; ++k)
          s += xq[i * m.d + k] * m.prior_params[k];
        mean[i] += s;
      }
      return;
  }
}

// Posterior mean/variance for one query batch (mod.rs:290-326 semantics:
// latent variance, observation noise NOT added back).
void predict(const Model& m, const double* xq, int64_t nq, double* mean,
             double* var) {
  std::vector<double> work(static_cast<size_t>(m.n) * nq);
  if (m.op == 0) {
    gp_predict_mean_var(static_cast<int>(m.kid1), m.p1.data(), m.x.data(),
                        m.n, m.d, m.l.data(), m.resid.data(), xq, nq,
                        work.data(), mean, var);
  } else {
    const int op = static_cast<int>(m.op);
    cov_matrix2(op, static_cast<int>(m.kid1), m.p1.data(),
                static_cast<int>(m.kid2), m.p2.data(), m.x.data(), m.n, xq,
                nq, m.d, work.data());
    solve_lower(m.l.data(), work.data(), m.n, nq);
    for (int64_t j = 0; j < nq; ++j) {
      double s = 0.0, kqq = 0.0;
      for (int64_t i = 0; i < m.n; ++i)
        s += work[i * nq + j] * work[i * nq + j];
      cov_matrix2(op, static_cast<int>(m.kid1), m.p1.data(),
                  static_cast<int>(m.kid2), m.p2.data(), xq + j * m.d, 1,
                  xq + j * m.d, 1, m.d, &kqq);
      var[j] = kqq - s;
    }
    solve_lower_t(m.l.data(), work.data(), m.n, nq);
    for (int64_t j = 0; j < nq; ++j) {
      double s = 0.0;
      for (int64_t i = 0; i < m.n; ++i)
        s += work[i * nq + j] * m.resid[i];
      mean[j] = s;
    }
  }
  add_prior_mean(m, xq, nq, mean);
}

bool recv_exact(int fd, void* dst, size_t bytes) {
  char* p = static_cast<char*>(dst);
  while (bytes > 0) {
    const ssize_t got = recv(fd, p, bytes, 0);
    if (got <= 0) return false;
    p += got;
    bytes -= static_cast<size_t>(got);
  }
  return true;
}

bool send_all(int fd, const void* src, size_t bytes) {
  const char* p = static_cast<const char*>(src);
  while (bytes > 0) {
    const ssize_t put = send(fd, p, bytes, 0);
    if (put <= 0) return false;
    p += put;
    bytes -= static_cast<size_t>(put);
  }
  return true;
}

bool send_error(int fd, uint32_t status) {
  const uint32_t head[2] = {kRespMagic, status};
  const uint64_t zero = 0;
  return send_all(fd, head, 8) && send_all(fd, &zero, 8);
}

// One request/response exchange; returns false when the connection should
// close (EOF or protocol error).
bool serve_one(const Model& m, int fd) {
  uint32_t head[2];  // magic, flags
  uint64_t dims[2];  // nq, d
  if (!recv_exact(fd, head, 8)) return false;  // EOF: client done
  if (head[0] != kReqMagic) return false;
  if (!recv_exact(fd, dims, 16)) return false;
  const uint64_t nq = dims[0];
  if (nq == 0 || nq > kMaxBatch || dims[1] != static_cast<uint64_t>(m.d))
    return send_error(fd, 1) && false;
  std::vector<double> xq(nq * m.d);
  if (!recv_exact(fd, xq.data(), 8 * xq.size())) return false;
  std::vector<double> mean(nq), var(nq);
  predict(m, xq.data(), static_cast<int64_t>(nq), mean.data(), var.data());
  const uint32_t rhead[2] = {kRespMagic, 0};
  if (!send_all(fd, rhead, 8) || !send_all(fd, &nq, 8)) return false;
  if (!send_all(fd, mean.data(), 8 * nq)) return false;
  if ((head[1] & kFlagVariance) && !send_all(fd, var.data(), 8 * nq))
    return false;
  return true;
}

// Connection handler run on its own thread. The Model is immutable after
// load and predict() uses only per-call buffers, so concurrent readers
// need no synchronization.
void serve_connection(const Model* m, int fd) {
  const int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  while (serve_one(*m, fd)) {
  }
  close(fd);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s <bundle> <port>\n", argv[0]);
    return 2;
  }
  Model model;
  if (!load_bundle(argv[1], &model)) {
    std::fprintf(stderr, "friedrich_served: bad bundle %s\n", argv[1]);
    return 1;
  }
  const int port = std::atoi(argv[2]);
  const int lsock = socket(AF_INET, SOCK_STREAM, 0);
  if (lsock < 0) return 1;
  const int one = 1;
  setsockopt(lsock, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(lsock, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0 ||
      listen(lsock, 16) < 0) {
    std::fprintf(stderr, "friedrich_served: cannot bind 127.0.0.1:%d\n",
                 port);
    return 1;
  }
  std::fprintf(stderr, "friedrich_served: n=%lld d=%lld on 127.0.0.1:%d\n",
               static_cast<long long>(model.n),
               static_cast<long long>(model.d), port);
  std::fflush(stderr);
  for (;;) {
    const int fd = accept(lsock, nullptr, nullptr);
    if (fd < 0) continue;
    std::thread(serve_connection, &model, fd).detach();
  }
}
