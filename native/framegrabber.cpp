// Native frame grabber: threaded image-sequence producer with a bounded
// prefetch ring, exposed through a C ABI for ctypes.
//
// TPU-native counterpart of the reference's FrameGrabber/FileGrabber runtime
// (scenelib2/framegrabber/framegrabber.cpp:75-104 bounded queue + producer
// thread; filegrabber.cpp:63-109 recursive sorted directory scan + decode):
// the host-side loader must keep the device fed without stalling the jitted
// step, so decoding runs on a worker thread into a fixed ring of frame
// buffers while the consumer pops in order. Unlike the reference there is no
// unsynchronised flag read; shutdown is condition-variable driven.
//
// Decodes P5/P2 PGM (the dataset format). Build: `make -C native`.

#include <atomic>
#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <mutex>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<uint8_t> data;
  int width = 0;
  int height = 0;
  long id = -1;
};

bool is_dir(const std::string &p) {
  struct stat sb;
  return stat(p.c_str(), &sb) == 0 && S_ISDIR(sb.st_mode);
}

void scan_dir(const std::string &dir, std::vector<std::string> &out) {
  DIR *d = opendir(dir.c_str());
  if (!d) return;
  std::vector<std::string> entries;
  while (dirent *e = readdir(d)) {
    std::string name = e->d_name;
    if (name == "." || name == "..") continue;
    entries.push_back(dir + "/" + name);
  }
  closedir(d);
  for (const auto &p : entries) {
    if (is_dir(p)) {
      scan_dir(p, out);
    } else {
      out.push_back(p);
    }
  }
}

// Minimal P5/P2 PGM decoder. Returns false on malformed input.
bool decode_pgm(const std::string &path, Frame &f) {
  FILE *fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  char magic[3] = {0};
  if (fscanf(fp, "%2s", magic) != 1) { fclose(fp); return false; }
  bool binary = strcmp(magic, "P5") == 0;
  if (!binary && strcmp(magic, "P2") != 0) { fclose(fp); return false; }

  long vals[3];
  int got = 0;
  while (got < 3) {
    int c = fgetc(fp);
    if (c == EOF) { fclose(fp); return false; }
    if (c == '#') {
      while (c != '\n' && c != EOF) c = fgetc(fp);
    } else if (isdigit(c)) {
      ungetc(c, fp);
      if (fscanf(fp, "%ld", &vals[got]) != 1) { fclose(fp); return false; }
      ++got;
    }
  }
  int w = (int)vals[0], h = (int)vals[1];
  long maxval = vals[2];
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) { fclose(fp); return false; }
  f.width = w;
  f.height = h;
  f.data.resize((size_t)w * h);
  if (binary) {
    fgetc(fp);  // single whitespace after maxval
    size_t n = fread(f.data.data(), 1, f.data.size(), fp);
    fclose(fp);
    return n == f.data.size();
  }
  for (size_t i = 0; i < f.data.size(); ++i) {
    long v;
    if (fscanf(fp, "%ld", &v) != 1) { fclose(fp); return false; }
    f.data[i] = (uint8_t)v;
  }
  fclose(fp);
  return true;
}

struct Grabber {
  std::vector<std::string> files;
  size_t ring_cap;
  std::vector<Frame> ring;
  size_t head = 0, tail = 0, count = 0;
  long next_to_produce = 0;
  std::mutex mu;
  std::condition_variable not_full, not_empty;
  std::atomic<bool> stop{false};
  std::thread worker;

  explicit Grabber(const char *dir, int prefetch) : ring_cap(prefetch > 0 ? prefetch : 50) {
    scan_dir(dir, files);
    std::sort(files.begin(), files.end());
    ring.resize(ring_cap);
    worker = std::thread([this] { produce(); });
  }

  ~Grabber() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    not_full.notify_all();
    not_empty.notify_all();
    if (worker.joinable()) worker.join();
  }

  void produce() {
    for (long i = 0; i < (long)files.size(); ++i) {
      Frame f;
      bool ok = decode_pgm(files[i], f);
      f.id = ok ? i : -1;
      std::unique_lock<std::mutex> lk(mu);
      not_full.wait(lk, [this] { return count < ring_cap || stop; });
      if (stop) return;
      ring[tail] = std::move(f);
      tail = (tail + 1) % ring_cap;
      ++count;
      not_empty.notify_one();
    }
    std::lock_guard<std::mutex> lk(mu);
    stop = true;  // end-of-sequence marker for consumers
    not_empty.notify_all();
  }

  // Pops the next frame; returns frame id, -1 on end, -2 on decode error.
  long next(uint8_t *out, int cap, int *w, int *h) {
    std::unique_lock<std::mutex> lk(mu);
    not_empty.wait(lk, [this] { return count > 0 || stop; });
    if (count == 0) return -1;
    Frame &f = ring[head];
    long id = f.id;
    if (id >= 0) {
      *w = f.width;
      *h = f.height;
      if ((int)f.data.size() <= cap) {
        memcpy(out, f.data.data(), f.data.size());
      } else {
        id = -2;
      }
    } else {
      id = -2;
    }
    head = (head + 1) % ring_cap;
    --count;
    not_full.notify_one();
    return id;
  }
};

}  // namespace

extern "C" {

void *fg_open(const char *dir, int prefetch) {
  if (!is_dir(dir)) return nullptr;
  return new Grabber(dir, prefetch);
}

long fg_count(void *h) { return h ? (long)((Grabber *)h)->files.size() : -1; }

long fg_next(void *h, uint8_t *out, int cap, int *w, int *hh) {
  return h ? ((Grabber *)h)->next(out, cap, w, hh) : -1;
}

// Random-access decode (no threading) for offline stacking.
long fg_get(void *h, long idx, uint8_t *out, int cap, int *w, int *hh) {
  Grabber *g = (Grabber *)h;
  if (!g || idx < 0 || idx >= (long)g->files.size()) return -1;
  Frame f;
  if (!decode_pgm(g->files[idx], f)) return -2;
  if ((int)f.data.size() > cap) return -2;
  *w = f.width;
  *hh = f.height;
  memcpy(out, f.data.data(), f.data.size());
  return idx;
}

void fg_close(void *h) { delete (Grabber *)h; }

}  // extern "C"
