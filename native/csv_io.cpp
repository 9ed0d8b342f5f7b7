// Native IO runtime for ssme_tpu: fast headerless-CSV parsing and a
// background-thread streaming writer.
//
// This is the C++ runtime layer replacing the reference's host-side IO —
// utils::read_data (reference include/ssme/utils.h:25-64) and the PMMH
// sample/message ofstreams (reference include/ssme/ada_pmmh_mvn.h:204-208,
// 272-322).  The compute path stays in XLA; this keeps the host side of
// sample streaming off the Python interpreter so device steps are never
// blocked on file IO.
//
// Exposed as a C ABI for ctypes.

#include <atomic>
#include <cctype>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSV reading
// ---------------------------------------------------------------------------

// Parse a headerless CSV of floats.  Returns a malloc'd row-major buffer
// (caller frees via ssme_free) and sets *rows/*cols.  Malformed rows are
// skipped (reported on stderr), matching utils::read_data's
// log-and-continue behavior (utils.h:37,53-56).  Returns nullptr on open
// failure or empty file.
float* ssme_csv_read(const char* path, long* rows, long* cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    std::fprintf(stderr, "ssme_tpu native: could not open %s\n", path);
    return nullptr;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(static_cast<size_t>(size));
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  std::vector<float> data;
  data.reserve(1024);
  long ncols = -1;
  long nrows = 0;
  size_t pos = 0;
  const size_t n = buf.size();
  std::vector<float> row;
  long line_num = 0;
  while (pos < n) {
    size_t eol = buf.find('\n', pos);
    if (eol == std::string::npos) eol = n;
    row.clear();
    bool bad = false;
    size_t p = pos;
    while (p < eol) {
      size_t comma = buf.find(',', p);
      if (comma == std::string::npos || comma > eol) comma = eol;
      // strtof on the token
      const char* start = buf.data() + p;
      char* end = nullptr;
      float v = std::strtof(start, &end);
      // token must consume through the comma/eol (allow trailing spaces/CR)
      const char* stop = buf.data() + comma;
      while (end < stop && (*end == ' ' || *end == '\r' || *end == '\t')) end++;
      if (end == start || end != stop) { bad = true; break; }
      row.push_back(v);
      p = comma + 1;
    }
    if (!row.empty() && !bad) {
      if (ncols < 0) ncols = static_cast<long>(row.size());
      if (static_cast<long>(row.size()) == ncols) {
        data.insert(data.end(), row.begin(), row.end());
        nrows++;
      } else {
        std::fprintf(stderr,
                     "ssme_tpu native: ragged row %ld in %s (skipped)\n",
                     line_num, path);
      }
    } else if (bad) {
      std::fprintf(stderr, "ssme_tpu native: parse error line %ld of %s\n",
                   line_num, path);
    }
    pos = eol + 1;
    line_num++;
  }
  if (nrows == 0 || ncols <= 0) return nullptr;
  float* out = static_cast<float*>(std::malloc(sizeof(float) * data.size()));
  if (!out) return nullptr;
  std::memcpy(out, data.data(), sizeof(float) * data.size());
  *rows = nrows;
  *cols = ncols;
  return out;
}

void ssme_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// Background streaming writer
// ---------------------------------------------------------------------------
//
// Single-producer queue drained by a dedicated writer thread: the Python
// side enqueues formatted lines and returns immediately, so host-device
// pipelines are never stalled on disk.  Replaces the reference's
// synchronous ofstream writes inside the MCMC loop
// (ada_pmmh_mvn.h:272-322).

struct SsmeWriter {
  FILE* f = nullptr;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<std::string> queue;
  std::atomic<bool> done{false};
  // flush correctness: a chunk is popped before fwrite, so an empty
  // queue does NOT mean all data reached the FILE*; track bytes.
  std::atomic<long> enqueued{0};
  std::atomic<long> written{0};

  void run() {
    for (;;) {
      std::string chunk;
      {
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [&] { return done.load() || !queue.empty(); });
        if (queue.empty()) {
          if (done.load()) break;
          continue;
        }
        chunk = std::move(queue.front());
        queue.pop_front();
      }
      std::fwrite(chunk.data(), 1, chunk.size(), f);
      written.fetch_add(static_cast<long>(chunk.size()));
    }
    std::fflush(f);
  }
};

void* ssme_writer_open(const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto* w = new SsmeWriter();
  w->f = f;
  w->worker = std::thread([w] { w->run(); });
  return w;
}

void ssme_writer_write(void* handle, const char* data, long len) {
  auto* w = static_cast<SsmeWriter*>(handle);
  {
    std::lock_guard<std::mutex> lock(w->mu);
    w->queue.emplace_back(data, static_cast<size_t>(len));
    w->enqueued.fetch_add(len);
  }
  w->cv.notify_one();
}

void ssme_writer_flush(void* handle) {
  auto* w = static_cast<SsmeWriter*>(handle);
  const long target = w->enqueued.load();
  while (w->written.load() < target) {
    std::this_thread::yield();
  }
  std::fflush(w->f);
}

void ssme_writer_close(void* handle) {
  auto* w = static_cast<SsmeWriter*>(handle);
  w->done.store(true);
  w->cv.notify_one();
  w->worker.join();
  std::fclose(w->f);
  delete w;
}

}  // extern "C"
