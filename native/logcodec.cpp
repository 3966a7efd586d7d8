// Binary laser-log codec — the engine's native data-loader.
//
// The reference has no log/replay capability at all (its only IPC is a JSON
// file, fast_slam_2/utils/serializer.py); this codec is the runtime piece
// that makes high-rate replay cheap: a flat fixed-record binary format with
// O(1) random access, written/read by tight C++ loops and exposed to Python
// via ctypes (fastslam_tpu/io/native_log.py), with a NumPy fallback that
// implements the identical byte layout.
//
// Format FSLG1 (little endian):
//   header (64 bytes):
//     char[5]  magic "FSLG1"
//     u8[3]    pad
//     u32      num_ticks
//     u32      num_beams
//     f32      min_range
//     f32      max_range
//     u32      record_bytes
//     u8[...]  reserved (zero)
//   then num_ticks records, each:
//     f64      timestamp
//     f32      cmd_v, cmd_w
//     u32      bumper (state | id << 8)
//     f64[3]   gt pose (x, y, yaw)
//     f32[B]   scan ranges
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

constexpr char kMagic[5] = {'F', 'S', 'L', 'G', '1'};
constexpr size_t kHeaderBytes = 64;

struct Header {
  uint32_t num_ticks;
  uint32_t num_beams;
  float min_range;
  float max_range;
  uint32_t record_bytes;
};

size_t record_bytes(uint32_t num_beams) {
  return 8 + 4 + 4 + 4 + 3 * 8 + 4ull * num_beams;
}

bool write_header(FILE* f, const Header& h) {
  unsigned char buf[kHeaderBytes];
  memset(buf, 0, sizeof(buf));
  memcpy(buf, kMagic, 5);
  memcpy(buf + 8, &h.num_ticks, 4);
  memcpy(buf + 12, &h.num_beams, 4);
  memcpy(buf + 16, &h.min_range, 4);
  memcpy(buf + 20, &h.max_range, 4);
  memcpy(buf + 24, &h.record_bytes, 4);
  return fwrite(buf, 1, kHeaderBytes, f) == kHeaderBytes;
}

bool read_header(FILE* f, Header* h) {
  unsigned char buf[kHeaderBytes];
  if (fread(buf, 1, kHeaderBytes, f) != kHeaderBytes) return false;
  if (memcmp(buf, kMagic, 5) != 0) return false;
  memcpy(&h->num_ticks, buf + 8, 4);
  memcpy(&h->num_beams, buf + 12, 4);
  memcpy(&h->min_range, buf + 16, 4);
  memcpy(&h->max_range, buf + 20, 4);
  memcpy(&h->record_bytes, buf + 24, 4);
  return h->record_bytes == record_bytes(h->num_beams);
}

}  // namespace

extern "C" {

// Returns 0 on success, negative on error.
int fslog_write(const char* path, uint32_t num_ticks, uint32_t num_beams,
                float min_range, float max_range,
                const double* timestamps,          // [T]
                const float* cmd_v,                // [T]
                const float* cmd_w,                // [T]
                const int32_t* bumper_state,       // [T]
                const int32_t* bumper_id,          // [T]
                const double* gt_poses,            // [T, 3]
                const float* scans) {              // [T, B]
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  Header h{num_ticks, num_beams, min_range, max_range,
           static_cast<uint32_t>(record_bytes(num_beams))};
  if (!write_header(f, h)) { fclose(f); return -2; }

  for (uint32_t t = 0; t < num_ticks; ++t) {
    uint32_t bumper = (static_cast<uint32_t>(bumper_state[t]) & 0xff) |
                      ((static_cast<uint32_t>(bumper_id[t]) & 0xff) << 8);
    if (fwrite(&timestamps[t], 8, 1, f) != 1 ||
        fwrite(&cmd_v[t], 4, 1, f) != 1 ||
        fwrite(&cmd_w[t], 4, 1, f) != 1 ||
        fwrite(&bumper, 4, 1, f) != 1 ||
        fwrite(&gt_poses[3 * t], 8, 3, f) != 3 ||
        fwrite(&scans[static_cast<size_t>(t) * num_beams], 4, num_beams, f)
            != num_beams) {
      fclose(f);
      return -3;
    }
  }
  fclose(f);
  return 0;
}

// Fills num_ticks/num_beams/min_range/max_range.  Returns 0 on success.
int fslog_read_header(const char* path, uint32_t* num_ticks,
                      uint32_t* num_beams, float* min_range,
                      float* max_range) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (!read_header(f, &h)) { fclose(f); return -2; }
  fclose(f);
  *num_ticks = h.num_ticks;
  *num_beams = h.num_beams;
  *min_range = h.min_range;
  *max_range = h.max_range;
  return 0;
}

// Reads ticks [start, start+count) into caller-allocated buffers.
int fslog_read(const char* path, uint32_t start, uint32_t count,
               double* timestamps, float* cmd_v, float* cmd_w,
               int32_t* bumper_state, int32_t* bumper_id,
               double* gt_poses, float* scans) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (!read_header(f, &h)) { fclose(f); return -2; }
  // 64-bit sum: start + count must not wrap u32 (fuzz: start=count=2^31)
  if (static_cast<uint64_t>(start) + count > h.num_ticks) {
    fclose(f);
    return -3;
  }

  if (fseek(f, static_cast<long>(kHeaderBytes +
            static_cast<size_t>(start) * h.record_bytes), SEEK_SET) != 0) {
    fclose(f);
    return -4;
  }
  for (uint32_t i = 0; i < count; ++i) {
    uint32_t bumper = 0;
    if (fread(&timestamps[i], 8, 1, f) != 1 ||
        fread(&cmd_v[i], 4, 1, f) != 1 ||
        fread(&cmd_w[i], 4, 1, f) != 1 ||
        fread(&bumper, 4, 1, f) != 1 ||
        fread(&gt_poses[3 * i], 8, 3, f) != 3 ||
        fread(&scans[static_cast<size_t>(i) * h.num_beams], 4, h.num_beams, f)
            != h.num_beams) {
      fclose(f);
      return -5;
    }
    bumper_state[i] = static_cast<int32_t>(bumper & 0xff);
    bumper_id[i] = static_cast<int32_t>((bumper >> 8) & 0xff);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
