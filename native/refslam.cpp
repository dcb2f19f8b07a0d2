// End-to-end cross-validation shim: compiles the REFERENCE orchestration
// translation units (monoslam.cpp, kalman.cpp, feature.cpp — the full
// GoOneStep per-frame loop, monoslam.cpp:108-180) headless behind tiny stub
// headers (native/refbuild/{pangolin,graphic,framegrabber}) and exposes a
// flat C ABI so tests/test_cross_native_e2e.py can replay the SAME frame
// sequence through the actual C++ reference and the JAX step and compare
// trajectories and per-frame decisions directly.
//
// This file contains NO reference code — only marshaling wrappers. The
// reference TUs are linked read-only from /root/reference (see Makefile
// `refslam` target). Test-only; never on the library's compute path.

#include <cstring>

#include "monoslam.h"
#include "kalman.h"

using namespace SceneLib2;

namespace {

void put(const Eigen::MatrixXd &m, double *out) {
  for (int i = 0; i < m.rows(); ++i)
    for (int j = 0; j < m.cols(); ++j) *out++ = m(i, j);
}

}  // namespace

extern "C" {

void *rs_create(const char *cfg_path) {
  MonoSLAM *m = new MonoSLAM();
  m->Init(cfg_path);
  return m;
}

void rs_destroy(void *h) { delete static_cast<MonoSLAM *>(h); }

// One reference GoOneStep on a grayscale frame (row-major u8).
int rs_go_one_step(void *h, const unsigned char *img, int rows, int cols,
                   int save_trajectory, int enable_mapping) {
  cv::Mat frame(rows, cols, CV_8UC1, const_cast<unsigned char *>(img));
  return static_cast<MonoSLAM *>(h)->GoOneStep(frame.clone(),
                                               save_trajectory != 0,
                                               enable_mapping != 0)
             ? 1
             : 0;
}

int rs_total_state_size(void *h) {
  return static_cast<MonoSLAM *>(h)->total_state_size_;
}

void rs_get_xv(void *h, double *out13) {
  const MonoSLAM *m = static_cast<MonoSLAM *>(h);
  for (int i = 0; i < 13; ++i) out13[i] = m->xv_[i];
}

void rs_get_pxx(void *h, double *out169) {
  put(static_cast<MonoSLAM *>(h)->Pxx_, out169);
}

// Full joint state/covariance via the reference's own gather
// (monoslam.cpp:501-546). Buffers must hold total_state_size_ (squared).
void rs_get_total_state(void *h, double *out) {
  MonoSLAM *m = static_cast<MonoSLAM *>(h);
  Eigen::VectorXd v(m->total_state_size_);
  m->construct_total_state(v);
  for (int i = 0; i < v.size(); ++i) out[i] = v[i];
}

void rs_get_total_cov(void *h, double *out) {
  MonoSLAM *m = static_cast<MonoSLAM *>(h);
  Eigen::MatrixXd P(m->total_state_size_, m->total_state_size_);
  m->construct_total_covariance(P);
  put(P, out);
}

int rs_num_features(void *h) {
  return static_cast<int>(static_cast<MonoSLAM *>(h)->feature_list_.size());
}

int rs_num_partial(void *h) {
  return static_cast<int>(
      static_cast<MonoSLAM *>(h)->feature_init_info_vector_.size());
}

int rs_next_free_label(void *h) {
  return static_cast<MonoSLAM *>(h)->next_free_label_;
}

int rs_successful_measurement_vector_size(void *h) {
  return static_cast<MonoSLAM *>(h)->successful_measurement_vector_size_;
}

int rs_number_of_visible_features(void *h) {
  return static_cast<MonoSLAM *>(h)->number_of_visible_features_;
}

// Per-feature bookkeeping snapshot. y6 receives y_ (3 entries for fully
// initialised features, 6 for rays; unused entries zeroed). h2/z2 receive
// the last predicted/actual measurement.
void rs_feature_info(void *h, int i, int *label, int *full, int *attempts,
                     int *successes, int *selected, int *success_flag,
                     double *y6, double *h2, double *z2) {
  const Feature *f = static_cast<MonoSLAM *>(h)->feature_list_[i];
  *label = f->label_;
  *full = f->fully_initialised_flag_ ? 1 : 0;
  *attempts = f->attempted_measurements_of_feature_;
  *successes = f->successful_measurements_of_feature_;
  *selected = f->selected_flag_ ? 1 : 0;
  *success_flag = f->successful_measurement_flag_ ? 1 : 0;
  for (int k = 0; k < 6; ++k) y6[k] = k < f->y_.size() ? f->y_[k] : 0.0;
  for (int k = 0; k < 2; ++k) {
    h2[k] = k < f->h_.size() ? f->h_[k] : 0.0;
    z2[k] = k < f->z_.size() ? f->z_[k] : 0.0;
  }
}

void rs_feature_patch(void *h, int i, unsigned char *out, int boxsize) {
  const Feature *f = static_cast<MonoSLAM *>(h)->feature_list_[i];
  for (int r = 0; r < boxsize; ++r)
    for (int c = 0; c < boxsize; ++c) out[r * boxsize + c] = f->patch_.at<unsigned char>(r, c);
}

// Partial-feature (particle depth filter) snapshot. lambdas/probs must hold
// at least `cap` entries; the surviving particle count is returned.
int rs_partial_info(void *h, int i, int *label, int *match_attempts,
                    double *mean, double *cov, double *lambdas, double *probs,
                    int cap) {
  const FeatureInitInfo &info =
      static_cast<MonoSLAM *>(h)->feature_init_info_vector_[i];
  *label = info.fp_->label_;
  *match_attempts = info.number_of_match_attempts_;
  *mean = info.mean_.size() > 0 ? info.mean_[0] : 0.0;
  *cov = info.covariance_.size() > 0 ? info.covariance_(0, 0) : 0.0;
  int n = static_cast<int>(info.particle_vector_.size());
  for (int k = 0; k < n && k < cap; ++k) {
    lambdas[k] = info.particle_vector_[k].lambda_[0];
    probs[k] = info.particle_vector_[k].probability_;
  }
  return n;
}

// Manual feature initialisation at a picked pixel (the GUI click path:
// pangolin_util.cpp:57-81 sets uu_/vv_ + location_selected_flag_, the
// example app then calls InitialiseFeature — monoslam.cpp:1211-1235).
void rs_initialise_feature(void *h, const unsigned char *img, int rows,
                           int cols, int uu, int vv) {
  MonoSLAM *m = static_cast<MonoSLAM *>(h);
  m->uu_ = uu;
  m->vv_ = vv;
  m->location_selected_flag_ = true;
  cv::Mat frame(rows, cols, CV_8UC1, const_cast<unsigned char *>(img));
  m->InitialiseFeature(frame.clone());
}

// Manual auto-init trigger (reference InitialiseAutoFeature,
// monoslam.cpp:1535-1541 -> AutoInitialiseFeature :823-868): future-pose
// region proposal + Shi-Tomasi patch pick + ray insertion, with none of
// GoOneStep's speed/visible-count gates.
void rs_initialise_auto_feature(void *h, const unsigned char *img, int rows,
                                int cols) {
  cv::Mat frame(rows, cols, CV_8UC1, const_cast<unsigned char *>(img));
  static_cast<MonoSLAM *>(h)->InitialiseAutoFeature(frame.clone());
}

// Add a feature with known world position and zero covariance (reference
// AddNewKnownFeature, monoslam.cpp:1278-1291; known-feature constructor
// feature.cpp:108-149 loads the patch image from `identifier`).
void rs_add_new_known_feature(void *h, const double *y3, const double *xp7,
                              const char *patch_path) {
  Eigen::VectorXd y(3), xp(7);
  for (int i = 0; i < 3; ++i) y[i] = y3[i];
  for (int i = 0; i < 7; ++i) xp[i] = xp7[i];
  static_cast<MonoSLAM *>(h)->AddNewKnownFeature(y, xp,
                                                 std::string(patch_path));
}

// Most recent init-feature search region (monoslam.cpp:870-1032).
int rs_init_search_region(void *h, int *ustart, int *vstart, int *ufinish,
                          int *vfinish) {
  const MonoSLAM *m = static_cast<MonoSLAM *>(h);
  *ustart = m->init_feature_search_ustart_;
  *vstart = m->init_feature_search_vstart_;
  *ufinish = m->init_feature_search_ufinish_;
  *vfinish = m->init_feature_search_vfinish_;
  return m->init_feature_search_region_defined_flag_ ? 1 : 0;
}

}  // extern "C"
