// Dense convex QP solver: Mehrotra predictor-corrector primal-dual interior
// point method with exact equality handling. Host-side native runtime piece of
// g1_locomotion_tpu:
//
//   * fills the role qpOASES/eiQuadProg play in the reference stack (per-tick
//     CPU QP solves behind OpenSoT's iHQP and the MPC node, SURVEY.md §2.2) —
//     single-robot CPU serving and a high-accuracy host oracle cross-checking
//     the batched TPU ADMM solver.
//
// Problem:   min 0.5 x'Hx + g'x   s.t.  l <= Ax <= u
//
// Rows with u - l < eps are *equalities* E x = b, kept exactly via a Schur
// complement on the condensed normal matrix. Inequality rows use an
// infeasible-start two-sided slack barrier:
//   F1: Hx + g + A_in'(zu - zl) + E' nu = 0
//   F2: A_in x - s = 0                      (residual rp)
//   F3: (s - l) o zl = sigma*mu             (p := s - l, consistent init)
//   F4: (u - s) o zu = sigma*mu             (q := u - s)
//   F5: E x - b = 0                         (residual re)
//
// Newton elimination:
//   K  = H + A_in' W A_in,  W = diag(zl/p + zu/q)
//   r  = -rd + A_in'[-W rp + (sig_l/p - zl) + (zu - sig_u/q)]
//   [K  E'] [dx ]   [ r  ]
//   [E  0 ] [dnu] = [-re ]     (solved via Schur: (E K^-1 E') dnu = E K^-1 r + re)
//
// Self-contained (no Eigen/BLAS); O(n^3) per step is fine at n <= few hundred.
// C ABI for ctypes binding (g1_locomotion_tpu/ops/native_qp.py).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// Cholesky factor in place (lower). Returns false on breakdown.
bool chol_factor(std::vector<double>& K, int n) {
  for (int j = 0; j < n; ++j) {
    double d = K[j * n + j];
    for (int k = 0; k < j; ++k) d -= K[j * n + k] * K[j * n + k];
    if (d <= 0.0 || !std::isfinite(d)) return false;
    d = std::sqrt(d);
    K[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = K[i * n + j];
      for (int k = 0; k < j; ++k) s -= K[i * n + k] * K[j * n + k];
      K[i * n + j] = s / d;
    }
  }
  return true;
}

void chol_solve(const std::vector<double>& L, double* rhs, int n) {
  for (int i = 0; i < n; ++i) {
    double s = rhs[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * rhs[k];
    rhs[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = rhs[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * rhs[k];
    rhs[i] = s / L[i * n + i];
  }
}

constexpr double kInf = 1e19;
constexpr double kEqTol = 1e-11;

}  // namespace

extern "C" {

// Returns 0 on success, 1 on max-iter, 2 on numerical failure.
// y (m): dual with OSQP sign convention (y>0 active at u, y<0 at l; equality
// rows carry nu). info[0]=iterations, info[1]=final gap.
int qp_solve_dense(int n, int m, const double* H, const double* g,
                   const double* A, const double* l, const double* u,
                   int max_iter, double tol, double* x_out, double* y_out,
                   double* info) {
  // Classify rows.
  std::vector<int> eq_rows, in_rows;
  for (int i = 0; i < m; ++i) {
    if (l[i] > -kInf && u[i] < kInf && u[i] - l[i] < kEqTol) eq_rows.push_back(i);
    else in_rows.push_back(i);
  }
  const int me = (int)eq_rows.size();
  const int mi = (int)in_rows.size();

  std::vector<double> E(me * n), b(me);
  for (int k = 0; k < me; ++k) {
    std::memcpy(&E[k * n], &A[eq_rows[k] * n], n * sizeof(double));
    b[k] = 0.5 * (l[eq_rows[k]] + u[eq_rows[k]]);
  }
  std::vector<double> Ai(mi * n), li(mi), ui(mi);
  std::vector<bool> has_l(mi), has_u(mi);
  for (int k = 0; k < mi; ++k) {
    std::memcpy(&Ai[k * n], &A[in_rows[k] * n], n * sizeof(double));
    li[k] = l[in_rows[k]];
    ui[k] = u[in_rows[k]];
    has_l[k] = li[k] > -kInf;
    has_u[k] = ui[k] < kInf;
  }

  // Consistent interior initialization: p = s - l > 0, q = u - s > 0.
  std::vector<double> x(n, 0.0), s(mi), zl(mi, 0.0), zu(mi, 0.0), p(mi, 1.0),
      q(mi, 1.0);
  for (int i = 0; i < mi; ++i) {
    if (has_l[i] && has_u[i]) {
      s[i] = 0.5 * (li[i] + ui[i]);
      p[i] = s[i] - li[i];
      q[i] = ui[i] - s[i];
      zl[i] = zu[i] = 1.0;
    } else if (has_l[i]) {
      s[i] = li[i] + 1.0; p[i] = 1.0; zl[i] = 1.0;
    } else if (has_u[i]) {
      s[i] = ui[i] - 1.0; q[i] = 1.0; zu[i] = 1.0;
    } else {
      s[i] = 0.0;
    }
  }
  std::vector<double> nu(me, 0.0);

  std::vector<double> K(n * n), L(n * n), Ax(mi), Ex(me), rd(n), rp(mi), re(me),
      dx(n), ds(mi), dzl(mi), dzu(mi), dp(mi), dq(mi), dnu(me), diagw(mi),
      sig_l(mi), sig_u(mi), r(n);

  int it = 0;
  double mu = 1.0;
  double rinf_last = 1e30;
  bool numeric_break = false;
  for (it = 0; it < max_iter; ++it) {
    for (int i = 0; i < mi; ++i) {
      double acc = 0.0;
      for (int j = 0; j < n; ++j) acc += Ai[i * n + j] * x[j];
      Ax[i] = acc;
      rp[i] = acc - s[i];
    }
    for (int k = 0; k < me; ++k) {
      double acc = -b[k];
      for (int j = 0; j < n; ++j) acc += E[k * n + j] * x[j];
      re[k] = acc;
    }
    for (int j = 0; j < n; ++j) {
      double acc = g[j];
      for (int k2 = 0; k2 < n; ++k2) acc += H[j * n + k2] * x[k2];
      for (int i = 0; i < mi; ++i) acc += Ai[i * n + j] * (zu[i] - zl[i]);
      for (int k = 0; k < me; ++k) acc += E[k * n + j] * nu[k];
      rd[j] = acc;
    }

    double gap = 0.0;
    int ncomp = 0;
    for (int i = 0; i < mi; ++i) {
      if (has_l[i]) { gap += p[i] * zl[i]; ++ncomp; }
      if (has_u[i]) { gap += q[i] * zu[i]; ++ncomp; }
    }
    mu = ncomp > 0 ? gap / ncomp : 0.0;

    double rinf = 0.0;
    for (double v : rd) rinf = std::max(rinf, std::fabs(v));
    for (double v : rp) rinf = std::max(rinf, std::fabs(v));
    for (double v : re) rinf = std::max(rinf, std::fabs(v));
    rinf_last = rinf;
    if (rinf < tol && mu < tol) break;

    for (int i = 0; i < mi; ++i) {
      double w = 0.0;
      if (has_l[i]) w += zl[i] / std::max(p[i], 1e-14);
      if (has_u[i]) w += zu[i] / std::max(q[i], 1e-14);
      diagw[i] = std::min(w, 1e14);
    }

    // K = H + Ai' W Ai, factored once per iteration.
    for (int j = 0; j < n; ++j) {
      for (int k2 = 0; k2 <= j; ++k2) {
        double acc = H[j * n + k2];
        for (int i = 0; i < mi; ++i)
          acc += Ai[i * n + j] * diagw[i] * Ai[i * n + k2];
        K[j * n + k2] = acc;
        K[k2 * n + j] = acc;
      }
      K[j * n + j] += 1e-12;
    }
    L = K;
    if (!chol_factor(L, n)) { numeric_break = true; break; }

    // Schur data: Kinv_ET (n x me) and, per solve, Kinv_r.
    std::vector<double> KiET(n * me), S(me * me);
    for (int k = 0; k < me; ++k) {
      std::vector<double> col(n);
      for (int j = 0; j < n; ++j) col[j] = E[k * n + j];
      chol_solve(L, col.data(), n);
      for (int j = 0; j < n; ++j) KiET[j * me + k] = col[j];
    }
    for (int a = 0; a < me; ++a)
      for (int c = 0; c < me; ++c) {
        double acc = 0.0;
        for (int j = 0; j < n; ++j) acc += E[a * n + j] * KiET[j * me + c];
        S[a * me + c] = acc;
      }
    for (int a = 0; a < me; ++a) S[a * me + a] += 1e-12;
    std::vector<double> LS = S;
    bool S_ok = me == 0 || chol_factor(LS, me);
    if (!S_ok) { numeric_break = true; break; }

    auto solve_newton = [&]() -> bool {
      // r = -rd + Ai'[-W rp + (sig_l/p - zl) + (zu - sig_u/q)]
      for (int j = 0; j < n; ++j) {
        double acc = -rd[j];
        for (int i = 0; i < mi; ++i) {
          double term = -diagw[i] * rp[i];
          if (has_l[i]) term += sig_l[i] / p[i] - zl[i];
          if (has_u[i]) term += zu[i] - sig_u[i] / q[i];
          acc += Ai[i * n + j] * term;
        }
        r[j] = acc;
      }
      // dnu from Schur: S dnu = E K^-1 r + re
      std::vector<double> Kir(r);
      chol_solve(L, Kir.data(), n);
      if (me > 0) {
        std::vector<double> rhs_nu(me);
        for (int k = 0; k < me; ++k) {
          double acc = re[k];
          for (int j = 0; j < n; ++j) acc += E[k * n + j] * Kir[j];
          rhs_nu[k] = acc;
        }
        chol_solve(LS, rhs_nu.data(), me);
        for (int k = 0; k < me; ++k) dnu[k] = rhs_nu[k];
        // dx = K^-1 (r - E' dnu)
        std::vector<double> rr(r);
        for (int j = 0; j < n; ++j)
          for (int k = 0; k < me; ++k) rr[j] -= E[k * n + j] * dnu[k];
        chol_solve(L, rr.data(), n);
        for (int j = 0; j < n; ++j) dx[j] = rr[j];
      } else {
        for (int j = 0; j < n; ++j) dx[j] = Kir[j];
      }
      for (int i = 0; i < mi; ++i) {
        double Adx = 0.0;
        for (int j = 0; j < n; ++j) Adx += Ai[i * n + j] * dx[j];
        ds[i] = Adx + rp[i];
        dp[i] = has_l[i] ? ds[i] : 0.0;
        dq[i] = has_u[i] ? -ds[i] : 0.0;
        dzl[i] = has_l[i] ? (sig_l[i] - p[i] * zl[i] - zl[i] * dp[i]) / p[i] : 0.0;
        dzu[i] = has_u[i] ? (sig_u[i] - q[i] * zu[i] - zu[i] * dq[i]) / q[i] : 0.0;
      }
      return true;
    };

    auto step_len = [&](double frac) {
      double a = 1.0;
      for (int i = 0; i < mi; ++i) {
        if (has_l[i]) {
          if (dp[i] < 0) a = std::min(a, -frac * p[i] / dp[i]);
          if (dzl[i] < 0) a = std::min(a, -frac * zl[i] / dzl[i]);
        }
        if (has_u[i]) {
          if (dq[i] < 0) a = std::min(a, -frac * q[i] / dq[i]);
          if (dzu[i] < 0) a = std::min(a, -frac * zu[i] / dzu[i]);
        }
      }
      return a;
    };

    // Predictor.
    std::fill(sig_l.begin(), sig_l.end(), 0.0);
    std::fill(sig_u.begin(), sig_u.end(), 0.0);
    solve_newton();

    double a_aff = step_len(1.0);
    double gap_aff = 0.0;
    for (int i = 0; i < mi; ++i) {
      if (has_l[i]) gap_aff += (p[i] + a_aff * dp[i]) * (zl[i] + a_aff * dzl[i]);
      if (has_u[i]) gap_aff += (q[i] + a_aff * dq[i]) * (zu[i] + a_aff * dzu[i]);
    }
    double mu_aff = ncomp > 0 ? gap_aff / ncomp : 0.0;
    double sigma = (mu > 0 && ncomp > 0) ? std::pow(mu_aff / mu, 3.0) : 0.0;

    // Corrector.
    for (int i = 0; i < mi; ++i) {
      sig_l[i] = has_l[i] ? sigma * mu - dp[i] * dzl[i] : 0.0;
      sig_u[i] = has_u[i] ? sigma * mu - dq[i] * dzu[i] : 0.0;
    }
    solve_newton();

    double alpha = std::min(1.0, step_len(0.995));
    if (ncomp == 0) alpha = 1.0;  // pure equality QP: full Newton step
    for (int j = 0; j < n; ++j) x[j] += alpha * dx[j];
    for (int k = 0; k < me; ++k) nu[k] += alpha * dnu[k];
    for (int i = 0; i < mi; ++i) {
      s[i] += alpha * ds[i];
      if (has_l[i]) { p[i] += alpha * dp[i]; zl[i] += alpha * dzl[i]; }
      if (has_u[i]) { q[i] += alpha * dq[i]; zu[i] += alpha * dzu[i]; }
    }
  }

  for (int j = 0; j < n; ++j) x_out[j] = x[j];
  for (int i = 0; i < m; ++i) y_out[i] = 0.0;
  for (int k = 0; k < mi; ++k) y_out[in_rows[k]] = zu[k] - zl[k];
  for (int k = 0; k < me; ++k) y_out[eq_rows[k]] = nu[k];
  if (info) { info[0] = it; info[1] = mu; }
  // Graceful degradation: a factorization breakdown after reaching near-tol
  // residuals is success at the achievable precision.
  if (numeric_break) return (rinf_last < 1e4 * tol && mu < 1e4 * tol) ? 0 : 2;
  return it < max_iter ? 0 : 1;
}

}  // extern "C"
