// Native .npy reader for the mqgan_tpu input pipeline.
//
// The training loop streams thousands of small float32 mel files per epoch;
// this loader mmaps the file, parses the NPY v1/v2 header, and returns a
// contiguous float32 buffer (converting from <f8/<f4 as needed) without any
// Python-side per-element work. Exposed via ctypes (utils/npy.py).
//
// Build: make -C native   (produces libmqgan_io.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Header {
  char dtype[8];     // e.g. "<f4", "<f8", "<i8"
  bool fortran;
  int64_t shape[2];  // up to 2-D; shape[1] == 0 for 1-D
  size_t data_offset;
};

// Parse the NPY header. Returns true on success.
bool parse_header(const uint8_t* buf, size_t len, Header* h) {
  static const uint8_t kMagic[6] = {0x93, 'N', 'U', 'M', 'P', 'Y'};
  if (len < 10 || memcmp(buf, kMagic, 6) != 0) return false;
  const uint8_t major = buf[6];
  size_t header_len, header_start;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    header_start = 10;
  } else {  // v2/v3: 4-byte length
    if (len < 12) return false;
    header_len = buf[8] | (buf[9] << 8) | ((size_t)buf[10] << 16) |
                 ((size_t)buf[11] << 24);
    header_start = 12;
  }
  if (header_start + header_len > len) return false;
  std::string hdr(reinterpret_cast<const char*>(buf + header_start), header_len);
  h->data_offset = header_start + header_len;

  // descr
  size_t d = hdr.find("'descr'");
  if (d == std::string::npos) return false;
  size_t q1 = hdr.find('\'', d + 7);
  if (q1 == std::string::npos) return false;
  q1 = hdr.find('\'', q1 + 1);  // skip to value opening quote
  // find the value between the next pair of quotes after the colon
  size_t colon = hdr.find(':', d);
  if (colon == std::string::npos) return false;
  size_t v1 = hdr.find('\'', colon);
  size_t v2 = hdr.find('\'', v1 + 1);
  if (v1 == std::string::npos || v2 == std::string::npos) return false;
  std::string descr = hdr.substr(v1 + 1, v2 - v1 - 1);
  if (descr.size() >= sizeof(h->dtype)) return false;
  strncpy(h->dtype, descr.c_str(), sizeof(h->dtype) - 1);
  h->dtype[sizeof(h->dtype) - 1] = 0;

  // fortran_order
  size_t f = hdr.find("'fortran_order'");
  if (f == std::string::npos) return false;
  h->fortran = hdr.find("True", f) != std::string::npos &&
               hdr.find("True", f) < hdr.find(',', f);

  // shape
  size_t s = hdr.find("'shape'");
  if (s == std::string::npos) return false;
  size_t p1 = hdr.find('(', s);
  size_t p2 = hdr.find(')', p1);
  if (p1 == std::string::npos || p2 == std::string::npos) return false;
  std::string shape_s = hdr.substr(p1 + 1, p2 - p1 - 1);
  h->shape[0] = h->shape[1] = 0;
  int dims = 0;
  const char* cur = shape_s.c_str();
  while (*cur && dims < 3) {
    while (*cur == ' ' || *cur == ',') cur++;
    if (!*cur) break;
    char* end;
    long long v = strtoll(cur, &end, 10);
    if (end == cur) break;
    if (dims < 2) h->shape[dims] = v;
    dims++;
    cur = end;
  }
  if (dims == 0 || dims > 2) return false;  // support 1-D / 2-D only
  return true;
}

}  // namespace

extern "C" {

// Load a .npy as float32. Returns the element count (>= 0) on success, or a
// negative error code (-1 io, -2 bad header/unsupported, -3 alloc).
// shape_out: int64[2] (shape_out[1] == 0 for 1-D). data_out: malloc'd buffer
// the caller frees with mq_free.
int64_t mq_load_npy_f32(const char* path, int64_t* shape_out, void** data_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t len = st.st_size;
  void* map = mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return -1;

  Header h;
  if (!parse_header(static_cast<const uint8_t*>(map), len, &h) || h.fortran) {
    munmap(map, len);
    return -2;
  }
  int64_t count = h.shape[0] * (h.shape[1] > 0 ? h.shape[1] : 1);
  const uint8_t* data = static_cast<const uint8_t*>(map) + h.data_offset;

  float* out = static_cast<float*>(malloc(sizeof(float) * count));
  if (!out) { munmap(map, len); return -3; }

  if (strcmp(h.dtype, "<f4") == 0) {
    if (h.data_offset + count * 4 > len) { free(out); munmap(map, len); return -2; }
    memcpy(out, data, count * sizeof(float));
  } else if (strcmp(h.dtype, "<f8") == 0) {
    if (h.data_offset + count * 8 > len) { free(out); munmap(map, len); return -2; }
    const double* src = reinterpret_cast<const double*>(data);
    for (int64_t i = 0; i < count; i++) out[i] = static_cast<float>(src[i]);
  } else if (strcmp(h.dtype, "<i8") == 0) {
    if (h.data_offset + count * 8 > len) { free(out); munmap(map, len); return -2; }
    const int64_t* src = reinterpret_cast<const int64_t*>(data);
    for (int64_t i = 0; i < count; i++) out[i] = static_cast<float>(src[i]);
  } else if (strcmp(h.dtype, "<i4") == 0) {
    if (h.data_offset + count * 4 > len) { free(out); munmap(map, len); return -2; }
    const int32_t* src = reinterpret_cast<const int32_t*>(data);
    for (int64_t i = 0; i < count; i++) out[i] = static_cast<float>(src[i]);
  } else {
    free(out);
    munmap(map, len);
    return -2;  // caller falls back to np.load
  }

  munmap(map, len);
  shape_out[0] = h.shape[0];
  shape_out[1] = h.shape[1];
  *data_out = out;
  return count;
}

void mq_free(void* p) { free(p); }

}  // extern "C"
