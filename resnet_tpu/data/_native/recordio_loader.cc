// Native ingest: RecordIO shard reader + multithreaded JPEG decode pool.
//
// TPU-native replacement for the reference's C++ ingest stack
// (mxnet src/io/iter_image_recordio_2.cc ImageRecordIOParser2 +
//  dmlc-core src/recordio.cc + include/dmlc/threadediter.h — SURVEY.md §3.3):
// reads dmlc-framed .rec shards, decodes JPEG via libjpeg(-turbo), and
// produces fixed-size uint8 RGB canvas batches (NHWC). Deliberately does
// NOT augment: crop/mirror/jitter/normalize run on the TPU (ops/augment.py),
// so this code only does what the host must do — IO and entropy decode.
//
// Decode-to-canvas: each image is bilinearly resized so its SHORTER side
// equals the canvas size, then center-cropped. The on-device random-resized
// crop then samples from this canvas.
//
// Threading: a pool of worker threads pulls example slots from an atomic
// cursor until the batch is full (the dmlc ThreadedIter role); the Python
// side runs this under a prefetch thread, so decode of batch N+1 overlaps
// the device step of batch N.
//
// C API (ctypes-friendly), all functions return 0 on success:
//   rtpu_open(rec, idx, canvas_h, canvas_w, threads, nparts, part, &handle)
//   rtpu_num_records(handle)
//   rtpu_begin_epoch(handle, epoch, shuffle, seed)
//   rtpu_next_batch(handle, batch, images_out, labels_out, &count)
//   rtpu_close(handle)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

constexpr uint32_t kMagic = 0xced7230a;

struct IRHeader {
  uint32_t flag;
  float label;
  uint64_t id;
  uint64_t id2;
};
static_assert(sizeof(IRHeader) == 24, "IRHeader must be packed to 24B");

// ---------------------------------------------------------------------------
// RecordIO parsing over a fully buffered shard.
// ---------------------------------------------------------------------------

struct RecordRef {
  uint64_t offset;  // byte offset of the record's first magic word
};

class Shard {
 public:
  bool Load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf_.resize(static_cast<size_t>(sz));
    size_t rd = std::fread(buf_.data(), 1, buf_.size(), f);
    std::fclose(f);
    return rd == buf_.size();
  }

  // Scan the shard for record boundaries (used when no .idx file).
  void ScanOffsets(std::vector<RecordRef>* out) const {
    uint64_t pos = 0;
    while (pos + 8 <= buf_.size()) {
      uint64_t start = pos;
      bool complete = false;
      while (pos + 8 <= buf_.size()) {
        uint32_t magic, lrec;
        std::memcpy(&magic, buf_.data() + pos, 4);
        std::memcpy(&lrec, buf_.data() + pos + 4, 4);
        if (magic != kMagic) return;  // trailing garbage: stop
        uint32_t cflag = lrec >> 29, len = lrec & ((1u << 29) - 1);
        pos += 8 + ((len + 3u) & ~3u);
        if (cflag == 0 || cflag == 3) { complete = true; break; }
      }
      if (!complete) return;
      out->push_back({start});
    }
  }

  // Reassemble the (possibly magic-split) record at `offset`.
  bool ReadRecord(uint64_t offset, std::vector<uint8_t>* out) const {
    out->clear();
    uint64_t pos = offset;
    bool first = true;
    while (pos + 8 <= buf_.size()) {
      uint32_t magic, lrec;
      std::memcpy(&magic, buf_.data() + pos, 4);
      std::memcpy(&lrec, buf_.data() + pos + 4, 4);
      if (magic != kMagic) return false;
      uint32_t cflag = lrec >> 29, len = lrec & ((1u << 29) - 1);
      pos += 8;
      if (pos + len > buf_.size()) return false;
      if (!first) {  // dmlc re-inserts the magic between joined pieces
        const uint32_t m = kMagic;
        const uint8_t* mb = reinterpret_cast<const uint8_t*>(&m);
        out->insert(out->end(), mb, mb + 4);
      }
      out->insert(out->end(), buf_.data() + pos, buf_.data() + pos + len);
      pos += (len + 3u) & ~3u;
      if (cflag == 0 || cflag == 3) return true;
      first = false;
    }
    return false;
  }

  const std::vector<uint8_t>& buf() const { return buf_; }

 private:
  std::vector<uint8_t> buf_;
};

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) with error-trap, + bilinear resize to canvas.
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void JpegErrExit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Decode JPEG bytes to RGB8. Returns false on corrupt input.
bool DecodeJpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = JpegErrExit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() +
        static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize RGB8 (sh,sw) -> (dh,dw).
void ResizeBilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                    int dh, int dw) {
  const float ys = static_cast<float>(sh) / dh;
  const float xs = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * ys - 0.5f;
    int y0 = std::max(0, std::min(sh - 1, static_cast<int>(fy)));
    int y1 = std::min(sh - 1, y0 + 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * xs - 0.5f;
      int x0 = std::max(0, std::min(sw - 1, static_cast<int>(fx)));
      int x1 = std::min(sw - 1, x0 + 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * sw + x0) * 3 + c];
        float v01 = src[(y0 * sw + x1) * 3 + c];
        float v10 = src[(y1 * sw + x0) * 3 + c];
        float v11 = src[(y1 * sw + x1) * 3 + c];
        float v0 = v00 + (v01 - v00) * wx;
        float v1 = v10 + (v11 - v10) * wx;
        dst[(y * dw + x) * 3 + c] =
            static_cast<uint8_t>(v0 + (v1 - v0) * wy + 0.5f);
      }
    }
  }
}

// Shorter-side resize + center crop to (ch, cw).
void DecodeToCanvas(const uint8_t* rgb, int h, int w, uint8_t* out,
                    int ch, int cw) {
  // scale so min(h', w') == corresponding canvas dim, preserving aspect
  float scale = std::max(static_cast<float>(ch) / h,
                         static_cast<float>(cw) / w);
  int rh = std::max(ch, static_cast<int>(h * scale + 0.5f));
  int rw = std::max(cw, static_cast<int>(w * scale + 0.5f));
  std::vector<uint8_t> resized(static_cast<size_t>(rh) * rw * 3);
  ResizeBilinear(rgb, h, w, resized.data(), rh, rw);
  int y0 = (rh - ch) / 2, x0 = (rw - cw) / 2;
  for (int y = 0; y < ch; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * cw * 3,
                resized.data() + (static_cast<size_t>(y0 + y) * rw + x0) * 3,
                static_cast<size_t>(cw) * 3);
  }
}

// ---------------------------------------------------------------------------
// Loader
// ---------------------------------------------------------------------------

struct Loader {
  Shard shard;
  std::vector<RecordRef> records;   // this worker's partition
  std::vector<uint32_t> order;      // epoch permutation into `records`
  uint64_t cursor = 0;              // next example within the epoch
  int canvas_h = 256, canvas_w = 256;
  int threads = 4;
};

bool LoadIndex(const char* idx_path, std::vector<RecordRef>* out) {
  FILE* f = std::fopen(idx_path, "r");
  if (!f) return false;
  char line[256];
  while (std::fgets(line, sizeof(line), f)) {
    char* tab = std::strchr(line, '\t');
    if (!tab) continue;
    out->push_back({std::strtoull(tab + 1, nullptr, 10)});
  }
  std::fclose(f);
  return !out->empty();
}

}  // namespace

extern "C" {

int rtpu_open(const char* rec_path, const char* idx_path, int canvas_h,
              int canvas_w, int threads, int num_parts, int part_index,
              void** out_handle) {
  auto* ld = new Loader();
  ld->canvas_h = canvas_h;
  ld->canvas_w = canvas_w;
  ld->threads = std::max(1, threads);
  if (!ld->shard.Load(rec_path)) { delete ld; return 1; }
  std::vector<RecordRef> all;
  if (!(idx_path && idx_path[0] && LoadIndex(idx_path, &all))) {
    ld->shard.ScanOffsets(&all);
  }
  if (all.empty()) { delete ld; return 2; }
  // strided partition: worker k takes records k, k+P, k+2P, ...
  // (the reference's num_parts/part_index contract: disjoint + balanced)
  for (size_t i = part_index; i < all.size();
       i += static_cast<size_t>(num_parts)) {
    ld->records.push_back(all[i]);
  }
  ld->order.resize(ld->records.size());
  for (uint32_t i = 0; i < ld->order.size(); ++i) ld->order[i] = i;
  *out_handle = ld;
  return 0;
}

long rtpu_num_records(void* handle) {
  return static_cast<long>(static_cast<Loader*>(handle)->records.size());
}

int rtpu_begin_epoch(void* handle, int epoch, int shuffle, unsigned seed) {
  auto* ld = static_cast<Loader*>(handle);
  ld->cursor = 0;
  for (uint32_t i = 0; i < ld->order.size(); ++i) ld->order[i] = i;
  if (shuffle) {
    std::mt19937 rng(seed ^ (0x9e3779b9u * static_cast<unsigned>(epoch + 1)));
    std::shuffle(ld->order.begin(), ld->order.end(), rng);
  }
  return 0;
}

// Fill up to `batch` examples. `images` is batch*ch*cw*3 uint8,
// `labels` is batch floats. *out_count < batch signals epoch end.
int rtpu_next_batch(void* handle, int batch, uint8_t* images, float* labels,
                    int* out_count) {
  auto* ld = static_cast<Loader*>(handle);
  const uint64_t remaining = ld->records.size() - ld->cursor;
  const int todo = static_cast<int>(
      std::min<uint64_t>(batch, remaining));
  *out_count = todo;
  if (todo == 0) return 0;
  const uint64_t base = ld->cursor;
  ld->cursor += todo;
  const size_t canvas_bytes =
      static_cast<size_t>(ld->canvas_h) * ld->canvas_w * 3;

  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto work = [&]() {
    std::vector<uint8_t> rec, rgb;
    int w = 0, h = 0;
    for (int i = next.fetch_add(1); i < todo; i = next.fetch_add(1)) {
      const RecordRef& rr =
          ld->records[ld->order[base + i]];
      if (!ld->shard.ReadRecord(rr.offset, &rec) ||
          rec.size() <= sizeof(IRHeader)) {
        failures.fetch_add(1);
        std::memset(images + i * canvas_bytes, 0, canvas_bytes);
        labels[i] = -1.f;
        continue;
      }
      IRHeader hdr;
      std::memcpy(&hdr, rec.data(), sizeof(hdr));
      size_t off = sizeof(hdr) + 4ull * hdr.flag;
      float label = hdr.flag
          ? *reinterpret_cast<const float*>(rec.data() + sizeof(hdr))
          : hdr.label;
      if (off >= rec.size() ||
          !DecodeJpeg(rec.data() + off, rec.size() - off, &rgb, &w, &h)) {
        failures.fetch_add(1);
        std::memset(images + i * canvas_bytes, 0, canvas_bytes);
        labels[i] = -1.f;
        continue;
      }
      DecodeToCanvas(rgb.data(), h, w, images + i * canvas_bytes,
                     ld->canvas_h, ld->canvas_w);
      labels[i] = label;
    }
  };

  int nthreads = std::min(ld->threads, todo);
  if (nthreads <= 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return failures.load() ? -failures.load() : 0;
}

void rtpu_close(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
