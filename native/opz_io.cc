// opz_io: native host-IO runtime for the TPU data pipeline.
//
// The reference framework gets its data-loading performance from the
// TensorFlow C++ runtime (tf.data interleave + TFRecord parsing + image
// decode all run in TF's native threadpool — SURVEY.md §2.5). This library
// is the framework-owned native equivalent for the host-side hot loop:
//
//   * TFRecord framing parser with masked-crc32c verification
//     (the RLDS on-disk format: length-prefixed protobuf records)
//   * a multi-threaded shard reader producing records into a bounded
//     ring queue (producer threads per shard group, one consumer)
//   * libjpeg RGB decode for encoded image observations
//
// Exposed as a plain C ABI consumed through ctypes
// (open_pi_zero_tpu/data/native_io.py).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libopz_io.so opz_io.cc -ljpeg -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

// --------------------------------------------------------------------------
// crc32c (Castagnoli), table-driven; TFRecord "masked crc" variant.
// --------------------------------------------------------------------------

namespace {

uint32_t g_crc_table[8][256];
std::once_flag g_crc_once;

void init_crc_table() {
  const uint32_t poly = 0x82F63B78u;  // reflected Castagnoli
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? (poly ^ (c >> 1)) : (c >> 1);
    g_crc_table[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = g_crc_table[0][i];
    for (int t = 1; t < 8; t++) {
      c = g_crc_table[0][c & 0xff] ^ (c >> 8);
      g_crc_table[t][i] = c;
    }
  }
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  std::call_once(g_crc_once, init_crc_table);
  uint32_t crc = 0xFFFFFFFFu;
  // slicing-by-8
  while (n >= 8) {
    uint32_t lo;
    uint32_t hi;
    memcpy(&lo, data, 4);
    memcpy(&hi, data + 4, 4);
    lo ^= crc;
    crc = g_crc_table[7][lo & 0xff] ^ g_crc_table[6][(lo >> 8) & 0xff] ^
          g_crc_table[5][(lo >> 16) & 0xff] ^ g_crc_table[4][lo >> 24] ^
          g_crc_table[3][hi & 0xff] ^ g_crc_table[2][(hi >> 8) & 0xff] ^
          g_crc_table[1][(hi >> 16) & 0xff] ^ g_crc_table[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) crc = g_crc_table[0][(crc ^ *data++) & 0xff] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

inline uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// --------------------------------------------------------------------------
// Record & bounded queue
// --------------------------------------------------------------------------

struct Record {
  uint8_t* data = nullptr;
  size_t len = 0;
};

struct Reader {
  std::vector<std::string> paths;
  std::vector<std::thread> workers;
  std::deque<Record> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  size_t capacity = 256;
  std::atomic<int> live_workers{0};
  std::atomic<bool> stop{false};
  std::atomic<long> crc_errors{0};
  std::atomic<long> open_errors{0};
  std::atomic<size_t> next_path{0};
  bool verify_crc = true;

  ~Reader() { shutdown(); }

  void shutdown() {
    {
      // hold mu while flipping stop: a waiter that already evaluated its
      // predicate must not be able to block after the notify fires
      std::lock_guard<std::mutex> lock(mu);
      stop.store(true);
    }
    cv_push.notify_all();
    cv_pop.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
    std::lock_guard<std::mutex> lock(mu);
    for (auto& r : queue) free(r.data);
    queue.clear();
  }

  // one worker: pull shard paths off the shared counter, stream records
  void work() {
    std::vector<uint8_t> buf;
    for (;;) {
      size_t idx = next_path.fetch_add(1);
      if (idx >= paths.size() || stop.load()) break;
      FILE* f = fopen(paths[idx].c_str(), "rb");
      if (!f) {
        open_errors.fetch_add(1);  // surfaced via opz_reader_open_errors
        continue;
      }
      for (;;) {
        uint8_t header[12];
        if (fread(header, 1, 12, f) != 12) break;  // EOF
        uint64_t len;
        memcpy(&len, header, 8);
        if (verify_crc) {
          uint32_t len_crc;
          memcpy(&len_crc, header + 8, 4);
          if (masked_crc(header, 8) != len_crc) {
            crc_errors.fetch_add(1);
            break;  // framing lost; abandon shard
          }
        }
        uint8_t* payload = static_cast<uint8_t*>(malloc(len));
        if (!payload || fread(payload, 1, len, f) != len) {
          free(payload);
          break;
        }
        uint8_t footer[4];
        if (fread(footer, 1, 4, f) != 4) {
          free(payload);
          break;
        }
        if (verify_crc) {
          uint32_t data_crc;
          memcpy(&data_crc, footer, 4);
          if (masked_crc(payload, len) != data_crc) {
            crc_errors.fetch_add(1);
            free(payload);
            continue;  // skip corrupt record, framing still intact
          }
        }
        std::unique_lock<std::mutex> lock(mu);
        cv_push.wait(lock,
                     [&] { return queue.size() < capacity || stop.load(); });
        if (stop.load()) {
          free(payload);
          lock.unlock();
          break;
        }
        queue.push_back(Record{payload, static_cast<size_t>(len)});
        lock.unlock();
        cv_pop.notify_one();
      }
      if (f) fclose(f);
    }
    bool last;
    {
      std::lock_guard<std::mutex> lock(mu);  // pair with the consumer's wait
      last = live_workers.fetch_sub(1) == 1;
    }
    if (last) cv_pop.notify_all();  // last one out wakes the consumer
  }
};

}  // namespace

// --------------------------------------------------------------------------
// C ABI
// --------------------------------------------------------------------------

extern "C" {

void* opz_reader_open(const char** paths, int n_paths, int n_threads,
                      int capacity, int verify_crc) {
  auto* r = new Reader();
  r->paths.assign(paths, paths + n_paths);
  r->capacity = capacity > 0 ? static_cast<size_t>(capacity) : 256;
  r->verify_crc = verify_crc != 0;
  int n = n_threads > 0 ? n_threads : 4;
  if (n > n_paths) n = n_paths;
  if (n < 1) n = 1;
  r->live_workers.store(n);
  for (int i = 0; i < n; i++) r->workers.emplace_back(&Reader::work, r);
  return r;
}

// 1 = record produced, 0 = end of stream. Caller frees with opz_buf_free.
int opz_reader_next(void* handle, uint8_t** data, size_t* len) {
  auto* r = static_cast<Reader*>(handle);
  std::unique_lock<std::mutex> lock(r->mu);
  r->cv_pop.wait(lock, [&] {
    return !r->queue.empty() || r->live_workers.load() == 0 || r->stop.load();
  });
  if (r->queue.empty()) return 0;
  Record rec = r->queue.front();
  r->queue.pop_front();
  lock.unlock();
  r->cv_push.notify_one();
  *data = rec.data;
  *len = rec.len;
  return 1;
}

long opz_reader_crc_errors(void* handle) {
  return static_cast<Reader*>(handle)->crc_errors.load();
}

long opz_reader_open_errors(void* handle) {
  return static_cast<Reader*>(handle)->open_errors.load();
}

void opz_buf_free(uint8_t* data) { free(data); }

void opz_reader_close(void* handle) { delete static_cast<Reader*>(handle); }

uint32_t opz_masked_crc32c(const uint8_t* data, size_t n) {
  return masked_crc(data, n);
}

// ---- JPEG decode (libjpeg) ----

struct OpzJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void opz_jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<OpzJpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode to RGB8. Returns malloc'd H*W*3 buffer (caller opz_buf_free) or
// nullptr on corrupt input.
uint8_t* opz_jpeg_decode(const uint8_t* data, size_t len, int* width,
                         int* height, int* channels) {
  jpeg_decompress_struct cinfo;
  OpzJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = opz_jpeg_error_exit;
  // volatile: `out` is written between setjmp and a possible longjmp; a
  // register copy would be indeterminate in the error path (C99 7.13.2.1)
  uint8_t* volatile out = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    free(out);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  const int c = cinfo.output_components;
  out = static_cast<uint8_t*>(malloc(static_cast<size_t>(w) * h * c));
  if (!out) {  // absurd declared dimensions (corrupt/hostile header)
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *width = w;
  *height = h;
  *channels = c;
  return out;
}

}  // extern "C"
