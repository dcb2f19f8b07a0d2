// Stand-in for the reference's graphic/graphictool.h (OpenGL/Pangolin
// rendering) used when compiling monoslam.cpp headless for end-to-end
// cross-validation. monoslam.cpp only constructs and deletes the
// GraphicTool (monoslam.cpp:79-80,1961); no drawing method is ever called
// on the SLAM path, so a no-op class satisfies it. Test-only.

#ifndef REFSLAM_STUB_GRAPHICTOOL_H
#define REFSLAM_STUB_GRAPHICTOOL_H

namespace SceneLib2 {

class MonoSLAM;

class GraphicTool {
 public:
  explicit GraphicTool(MonoSLAM *) {}
};

}  // namespace SceneLib2

#endif  // REFSLAM_STUB_GRAPHICTOOL_H
