// Stand-in for the reference's framegrabber/framegrabber.h (Boost-threaded
// frame producer) used when compiling monoslam.cpp headless for end-to-end
// cross-validation. monoslam.cpp only constructs it and calls Init
// (monoslam.cpp:1962-1963); frames are fed directly to GoOneStep by the
// test harness, so a no-op class satisfies it. Test-only.

#ifndef REFSLAM_STUB_FRAMEGRABBER_H
#define REFSLAM_STUB_FRAMEGRABBER_H

#include <string>

namespace SceneLib2 {

class FrameGrabber {
 public:
  FrameGrabber() {}
  void Init(const std::string &, bool) {}
};

}  // namespace SceneLib2

#endif  // REFSLAM_STUB_FRAMEGRABBER_H
