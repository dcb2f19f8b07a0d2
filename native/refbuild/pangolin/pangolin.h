// Minimal header-only stand-in for the two Pangolin facilities the
// reference's MonoSLAM::Init uses (monoslam.cpp:1578-1846): ParseVarsFile
// ("key = value;" flat config with '#' comments) and typed Var<T> lookups
// with defaults. This lets the REFERENCE monoslam.cpp compile and run
// headless for end-to-end cross-validation (tests/test_cross_native_e2e.py)
// without Pangolin, OpenGL, or Boost. Test-only; never on the compute path.

#ifndef REFSLAM_STUB_PANGOLIN_H
#define REFSLAM_STUB_PANGOLIN_H

#include <cstdlib>
#include <fstream>
#include <map>
#include <string>

namespace pangolin {

inline std::map<std::string, std::string> &var_store() {
  static std::map<std::string, std::string> store;
  return store;
}

inline std::string refslam_trim(const std::string &s) {
  const char *ws = " \t\r\n";
  std::string::size_type a = s.find_first_not_of(ws);
  if (a == std::string::npos) return "";
  std::string::size_type b = s.find_last_not_of(ws);
  return s.substr(a, b - a + 1);
}

inline void ParseVarsFile(const std::string &path) {
  std::ifstream f(path.c_str());
  std::string line;
  while (std::getline(f, line)) {
    std::string::size_type hash = line.find('#');
    if (hash != std::string::npos) line = line.substr(0, hash);
    std::string::size_type eq = line.find('=');
    if (eq == std::string::npos) continue;
    std::string key = refslam_trim(line.substr(0, eq));
    std::string val = refslam_trim(line.substr(eq + 1));
    if (!val.empty() && val[val.size() - 1] == ';')
      val = refslam_trim(val.substr(0, val.size() - 1));
    if (!key.empty()) var_store()[key] = val;
  }
}

template <typename T>
T refslam_convert(const std::string &s);

template <>
inline double refslam_convert<double>(const std::string &s) {
  return std::atof(s.c_str());
}

template <>
inline int refslam_convert<int>(const std::string &s) {
  return std::atoi(s.c_str());
}

template <>
inline bool refslam_convert<bool>(const std::string &s) {
  return s == "1" || s == "true" || s == "True";
}

template <>
inline std::string refslam_convert<std::string>(const std::string &s) {
  return s;
}

template <typename T>
class Var {
 public:
  Var(const std::string &name, const T &def) {
    std::map<std::string, std::string>::const_iterator it =
        var_store().find(name);
    val_ = (it == var_store().end()) ? def : refslam_convert<T>(it->second);
  }
  operator const T &() const { return val_; }

 private:
  T val_;
};

}  // namespace pangolin

#endif  // REFSLAM_STUB_PANGOLIN_H
