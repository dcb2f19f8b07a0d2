// Cross-validation shim: compiles the REFERENCE C++ math translation units
// (camera.cpp, motion_model.cpp, feature_model.cpp, full/part_feature_model.cpp,
// feature_init_info.cpp, improc/*.cpp — all Pangolin-free) behind a flat C ABI
// so tests can cross-check the JAX implementations and the NumPy oracle against
// the actual reference binaries on random inputs.
//
// This file contains NO reference code — only wrappers. It is built by
// `make -C native crosscheck REF=/root/reference` (see Makefile) against the
// read-only reference tree and the Eigen headers vendored by tensorflow.
// Used by tests/test_cross_native.py; never on the library's compute path.

#include <cstring>

#include "camera.h"
#include "motion_model.h"
#include "feature_model.h"
#include "full_feature_model.h"
#include "part_feature_model.h"
#include "feature_init_info.h"
#include "support/math_util.h"
#include "improc/improc.h"
#include "improc/search_multiple_overlapping_ellipses.h"

using namespace SceneLib2;

namespace {

Camera g_cam;
MotionModel g_motion;
FullFeatureModel g_full(2, 3, 3, &g_cam, &g_motion);
PartFeatureModel g_part(2, 6, 6, &g_cam, &g_motion, 3);

// Eigen is column-major by default; all shim buffers are row-major.
void put(const Eigen::MatrixXd &m, double *out) {
  for (int i = 0; i < m.rows(); ++i)
    for (int j = 0; j < m.cols(); ++j) *out++ = m(i, j);
}

Eigen::MatrixXd get(const double *in, int rows, int cols) {
  Eigen::MatrixXd m(rows, cols);
  for (int i = 0; i < rows; ++i)
    for (int j = 0; j < cols; ++j) m(i, j) = *in++;
  return m;
}

Eigen::VectorXd vec(const double *in, int n) {
  Eigen::VectorXd v(n);
  for (int i = 0; i < n; ++i) v[i] = in[i];
  return v;
}

// q buffers are [w, x, y, z] — the state-vector order.
Eigen::Quaterniond quat(const double *q) {
  return Eigen::Quaterniond(q[0], q[1], q[2], q[3]);
}

}  // namespace

extern "C" {

// ------------------------------------------------------------------ camera
void xc_set_camera(int w, int h, double fku, double fkv, double u0, double v0,
                   double kd1, int sd) {
  g_cam.SetCameraParameters(w, h, fku, fkv, u0, v0, kd1, sd);
}

void xc_camera_project(const double *y, double *h2, double *jac) {
  Eigen::Vector2d h = g_cam.Project(Eigen::Vector3d(y[0], y[1], y[2]));
  h2[0] = h[0];
  h2[1] = h[1];
  put(g_cam.ProjectionJacobian(), jac);  // uses last_camera_ set by Project
}

void xc_camera_unproject(const double *h2, double *y, double *jac) {
  Eigen::Vector3d c = g_cam.Unproject(Eigen::Vector2d(h2[0], h2[1]));
  y[0] = c[0];
  y[1] = c[1];
  y[2] = c[2];
  put(g_cam.UnprojectionJacobian(), jac);  // uses last_image_centred_
}

void xc_camera_noise(const double *h2, double *R4) {
  put(g_cam.MeasurementNoise(Eigen::Vector2d(h2[0], h2[1])), R4);
}

// ------------------------------------------------------------------ motion
void xc_motion_fv(const double *xv, const double *u, double dt, double *fv,
                  double *F) {
  g_motion.func_fv_and_dfv_by_dxv(vec(xv, 13), vec(u, 3), dt);
  put(g_motion.fvRES_, fv);
  put(g_motion.dfv_by_dxvRES_, F);
}

void xc_motion_Q(const double *xv, const double *u, double dt, double *Q) {
  g_motion.func_Q(vec(xv, 13), vec(u, 3), dt);
  put(g_motion.QxRES_, Q);
}

void xc_motion_xvnorm(const double *xv, double *xvn, double *J) {
  g_motion.func_xvnorm_and_dxvnorm_by_dxv(vec(xv, 13));
  put(g_motion.xvnormRES_, xvn);
  put(g_motion.dxvnorm_by_dxvRES_, J);
}

void xc_motion_dqomegadt(const double *om, double dt, double *out) {
  Eigen::MatrixXd m(4, 3);  // callee writes elements without resizing
  g_motion.dqomegadt_by_domega(Eigen::Vector3d(om[0], om[1], om[2]), dt, m);
  put(m, out);
}

void xc_dqnorm_by_dq(const double *q, double *out) {
  put(g_motion.dqnorm_by_dq(quat(q)), out);
}

// --------------------------------------------------------------- math_util
void xc_dq3_by_dq1(const double *q, double *out) { put(dq3_by_dq1(quat(q)), out); }
void xc_dq3_by_dq2(const double *q, double *out) { put(dq3_by_dq2(quat(q)), out); }

void xc_quat_from_av(const double *av, double *q) {
  Eigen::Quaterniond r =
      QuaternionFromAngularVelocity(Eigen::Vector3d(av[0], av[1], av[2]));
  q[0] = r.w();
  q[1] = r.x();
  q[2] = r.y();
  q[3] = r.z();
}

// --------------------------------------------------------- feature_model base
void xc_dqbar_by_dq(double *out) { put(g_full.dqbar_by_dq(), out); }

void xc_dRq_times_a_by_dq(const double *q, const double *a, double *out) {
  put(g_full.dRq_times_a_by_dq(quat(q), Eigen::Vector3d(a[0], a[1], a[2])), out);
}

void xc_func_si(const double *Pxx, const double *Pxy, const double *Pyy,
                const double *dh_dxv, const double *dh_dy, const double *Ri,
                double *S) {
  g_full.func_Si(get(Pxx, 13, 13), get(Pxy, 13, 3), get(Pyy, 3, 3),
                 get(dh_dxv, 2, 13), get(dh_dy, 2, 3), get(Ri, 2, 2));
  put(g_full.SiRES_, S);
}

// ------------------------------------------------------------- full feature
void xc_full_hi(const double *y, const double *xp, double *hi, double *dhi_dxp,
                double *dhi_dyi) {
  g_full.func_hi_and_dhi_by_dxp_and_dhi_by_dyi(vec(y, 3), vec(xp, 7));
  put(g_full.hiRES_, hi);
  put(g_full.dhi_by_dxpRES_, dhi_dxp);
  put(g_full.dhi_by_dyiRES_, dhi_dyi);
}

void xc_full_zeroedyi(const double *y, const double *xp, double *z,
                      double *dz_dxp, double *dz_dyi) {
  g_full.func_zeroedyi_and_dzeroedyi_by_dxp_and_dzeroedyi_by_dyi(vec(y, 3),
                                                                 vec(xp, 7));
  put(g_full.zeroedyiRES_, z);
  put(g_full.dzeroedyi_by_dxpRES_, dz_dxp);
  put(g_full.dzeroedyi_by_dyiRES_, dz_dyi);
}

int xc_full_visibility(const double *xp, const double *y, const double *xporig,
                       const double *hi) {
  return g_full.visibility_test(vec(xp, 7), vec(y, 3), vec(xporig, 7), vec(hi, 2));
}

double xc_full_selection_score(const double *S) {
  return g_full.selection_score(get(S, 2, 2));
}

// ------------------------------------------------------------- part feature
void xc_part_ypi(const double *hi, const double *xp, double *ypi,
                 double *dypi_dxp, double *dypi_dhi, double *Ri) {
  g_part.func_ypi_and_dypi_by_dxp_and_dypi_by_dhi_and_Ri(vec(hi, 2), vec(xp, 7));
  put(g_part.ypiRES_, ypi);
  put(g_part.dypi_by_dxpRES_, dypi_dxp);
  put(g_part.dypi_by_dhiRES_, dypi_dhi);
  put(g_part.RiRES_, Ri);
}

void xc_part_hpi(const double *yi, const double *xp, double lambda, double *hpi,
                 double *dhpi_dxp, double *dhpi_dyi) {
  Eigen::VectorXd l(1);
  l[0] = lambda;
  g_part.func_hpi_and_dhpi_by_dxp_and_dhpi_by_dyi(vec(yi, 6), vec(xp, 7), l);
  put(g_part.hpiRES_, hpi);
  put(g_part.dhpi_by_dxpRES_, dhpi_dxp);
  put(g_part.dhpi_by_dyiRES_, dhpi_dyi);
}

void xc_part_yfi(const double *ypi, double lambda, double *yfi,
                 double *dyfi_dypi, double *dyfi_dl) {
  Eigen::VectorXd l(1);
  l[0] = lambda;
  g_part.func_yfi_and_dyfi_by_dypi_and_dyfi_by_dlambda(vec(ypi, 6), l);
  put(g_part.yfiRES_, yfi);
  put(g_part.dyfi_by_dypiRES_, dyfi_dypi);
  put(g_part.dyfi_by_dlambdaRES_, dyfi_dl);
}

// ------------------------------------------------------------------ improc
double xc_correlate2(int x0, int y0, int x0lim, int y0lim, int x1, int y1,
                     const unsigned char *p0, int p0rows, int p0cols,
                     const unsigned char *p1, int p1rows, int p1cols,
                     double *sd0, double *sd1) {
  cv::Mat m0(p0rows, p0cols, CV_8UC1, const_cast<unsigned char *>(p0));
  cv::Mat m1(p1rows, p1cols, CV_8UC1, const_cast<unsigned char *>(p1));
  return correlate2_warning(x0, y0, x0lim, y0lim, x1, y1, m0, m1, sd0, sd1);
}

// Multi-ellipse particle search over a shared correlation cache
// (search_multiple_overlapping_ellipses.cpp). puinv: n row-major 2x2 blocks.
void xc_search_ellipses(const unsigned char *image, int rows, int cols,
                        const unsigned char *patch, int boxsize, int n,
                        const double *puinv, const double *centres, int *flags,
                        int *us, int *vs) {
  cv::Mat img(rows, cols, CV_8UC1, const_cast<unsigned char *>(image));
  cv::Mat pat(boxsize, boxsize, CV_8UC1, const_cast<unsigned char *>(patch));
  SearchMultipleOverlappingEllipses s(img, pat, boxsize);
  for (int i = 0; i < n; ++i) {
    Eigen::Matrix2d PuInv;
    PuInv << puinv[4 * i], puinv[4 * i + 1], puinv[4 * i + 2], puinv[4 * i + 3];
    s.add_ellipse(PuInv, Eigen::Vector2d(centres[2 * i], centres[2 * i + 1]));
  }
  s.search();
  int i = 0;
  for (auto it = s.begin(); it != s.end(); ++it, ++i) {
    flags[i] = it->result_flag_ ? 1 : 0;
    us[i] = it->result_u_;
    vs[i] = it->result_v_;
  }
}

// ------------------------------------------------- particle depth filter
// Mirrors the exact reference sequence (monoslam.cpp:1452-1484): Bayes
// multiply by the Gaussian likelihood, normalise+cumulative, prune, moments.
// Returns 1 on success, 0 if all likelihoods were zero (feature deleted).
// lambdas/probs/zs/hs/sinvs/dets/success: per-particle inputs; n_out receives
// the surviving count; out arrays are filled for survivors in order.
int xc_particle_update(int n, const double *lambdas, const double *probs,
                       const double *zs, const double *hs, const double *sinvs,
                       const double *dets, const int *success,
                       double prune_thresh, int *n_out, double *lam_out,
                       double *prob_out, double *cum_out, double *mean,
                       double *cov) {
  FeatureInitInfo info(nullptr, 1, 2);
  for (int i = 0; i < n; ++i) {
    Eigen::VectorXd l(1);
    l[0] = lambdas[i];
    info.add_particle(l, probs[i]);
  }
  int i = 0;
  for (auto &p : info.particle_vector_) {
    p.m_z_ = Eigen::Vector2d(zs[2 * i], zs[2 * i + 1]);
    p.m_h_ = Eigen::Vector2d(hs[2 * i], hs[2 * i + 1]);
    p.m_SInv_ = get(sinvs + 4 * i, 2, 2);
    p.m_detS_ = dets[i];
    p.m_successful_measurement_flag_ = success[i] != 0;
    double likelihood = 0.0;
    if (p.m_successful_measurement_flag_) {
      Eigen::VectorXd nu = p.m_z_ - p.m_h_;
      double nuT_Sinv_nu = nu.dot(p.m_SInv_ * nu);
      likelihood = (1.0 / (sqrt(2.0 * M_PI * p.m_detS_))) * exp(-0.5 * nuT_Sinv_nu);
    }
    p.probability_ *= likelihood;
    ++i;
  }
  if (!info.normalise_particle_vector_and_calculate_cumulative()) return 0;
  info.prune_particle_vector(prune_thresh);
  info.calculate_mean_and_covariance();
  *n_out = static_cast<int>(info.particle_vector_.size());
  i = 0;
  for (auto &p : info.particle_vector_) {
    lam_out[i] = p.lambda_[0];
    prob_out[i] = p.probability_;
    cum_out[i] = p.cumulative_probability_;
    ++i;
  }
  *mean = info.mean_[0];
  *cov = info.covariance_(0, 0);
  return 1;
}

// Particle::set_S — Cholesky-based inverse + determinant
// (feature_init_info.cpp:57-65).
void xc_particle_set_S(const double *S4, double *SInv4, double *detS) {
  Eigen::VectorXd l(1);
  l[0] = 1.0;
  Particle p(l, 1.0, 2);
  p.set_S(get(S4, 2, 2));
  put(p.m_SInv_, SInv4);
  *detS = p.m_detS_;
}

}  // extern "C"
