// trinerflet_tpu native runtime library.
//
// The reference ships its runtime-adjacent native code as JIT-compiled
// PyTorch C++/CUDA extensions (aux_libs/*/backend.py). The TPU framework's
// compute path is XLA/Pallas; this library covers the *host runtime* side:
//
//   * a PNG decoder (zlib inflate + scanline unfiltering, 8-bit gray/RGB(A))
//     and an OpenMP-threaded dataset loader that decodes a whole scene's
//     images into one float32 tensor with optional box downscaling — the
//     data-loader role of the reference's provider preload path,
//   * OpenMP image metrics (PSNR, gaussian-window SSIM) for evaluation loops.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decoding
// ---------------------------------------------------------------------------

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an in-memory PNG. Returns 0 on success; fills w/h/channels and
// writes unfiltered 8-bit pixels into out (caller allocates >= w*h*4).
static int decode_png(const uint8_t* data, size_t len, int* w, int* h,
                      int* channels, uint8_t* out, size_t out_cap) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(data, sig, 8) != 0) return -1;
  size_t pos = 8;
  int width = 0, height = 0, bitdepth = 0, colortype = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t clen = (data[pos] << 24) | (data[pos + 1] << 16) |
                    (data[pos + 2] << 8) | data[pos + 3];
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + clen > len) return -2;
    if (!memcmp(type, "IHDR", 4)) {
      width = (body[0] << 24) | (body[1] << 16) | (body[2] << 8) | body[3];
      height = (body[4] << 24) | (body[5] << 16) | (body[6] << 8) | body[7];
      bitdepth = body[8];
      colortype = body[9];
      interlace = body[12];
      if (bitdepth != 8 || interlace != 0) return -3;  // unsupported
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), body, body + clen);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  int ch;
  switch (colortype) {
    case 0: ch = 1; break;
    case 2: ch = 3; break;
    case 4: ch = 2; break;
    case 6: ch = 4; break;
    default: return -4;  // palettes unsupported
  }
  size_t stride = (size_t)width * ch;
  size_t raw_len = (stride + 1) * height;
  std::vector<uint8_t> raw(raw_len);
  uLongf dst_len = raw_len;
  if (uncompress(raw.data(), &dst_len, idat.data(), idat.size()) != Z_OK ||
      dst_len != raw_len)
    return -5;
  if (out_cap < stride * height) return -6;
  // un-filter scanlines
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < height; y++) {
    const uint8_t* src = raw.data() + (size_t)y * (stride + 1);
    uint8_t filter = src[0];
    uint8_t* dst = out + (size_t)y * stride;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= (size_t)ch ? dst[x - ch] : 0;
      int b = prev[x];
      int c = x >= (size_t)ch ? prev[x - ch] : 0;
      int v = src[1 + x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -7;
      }
      dst[x] = (uint8_t)v;
    }
    memcpy(prev.data(), dst, stride);
  }
  *w = width;
  *h = height;
  *channels = ch;
  return 0;
}

int tn_decode_png_file(const char* path, int* w, int* h, int* channels,
                       uint8_t* out, long out_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (fread(buf.data(), 1, sz, f) != (size_t)sz) {
    fclose(f);
    return -11;
  }
  fclose(f);
  return decode_png(buf.data(), sz, w, h, channels, out, out_cap);
}

// Decode a batch of same-shape PNGs in parallel into a float32 tensor
// (V, H/ds, W/ds, out_ch) in [0, 1]; gray is broadcast, missing alpha -> 1.
// paths: concatenated NUL-separated strings. Returns 0 or first error code.
int tn_load_image_batch(const char* paths, int num, int H, int W, int ds,
                        int out_ch, float* out) {
  int err = 0;
  std::vector<const char*> ptrs(num);
  const char* p = paths;
  for (int i = 0; i < num; i++) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  int Ho = H / ds, Wo = W / ds;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < num; i++) {
    if (err) continue;
    std::vector<uint8_t> px((size_t)H * W * 4);
    int w, h, ch;
    int rc = tn_decode_png_file(ptrs[i], &w, &h, &ch, px.data(), px.size());
    if (rc != 0 || w != W || h != H) {
#pragma omp critical
      err = rc != 0 ? rc : -20;
      continue;
    }
    float* dst = out + (size_t)i * Ho * Wo * out_ch;
    for (int y = 0; y < Ho; y++) {
      for (int x = 0; x < Wo; x++) {
        float acc[4] = {0, 0, 0, 0};
        for (int dy = 0; dy < ds; dy++) {
          for (int dx = 0; dx < ds; dx++) {
            const uint8_t* s = px.data() + ((size_t)(y * ds + dy) * W + (x * ds + dx)) * ch;
            float v[4];
            if (ch == 1) {
              v[0] = v[1] = v[2] = s[0];
              v[3] = 255.f;
            } else if (ch == 2) {
              v[0] = v[1] = v[2] = s[0];
              v[3] = s[1];
            } else if (ch == 3) {
              v[0] = s[0]; v[1] = s[1]; v[2] = s[2]; v[3] = 255.f;
            } else {
              v[0] = s[0]; v[1] = s[1]; v[2] = s[2]; v[3] = s[3];
            }
            for (int c = 0; c < 4; c++) acc[c] += v[c];
          }
        }
        float inv = 1.0f / (255.0f * ds * ds);
        for (int c = 0; c < out_ch; c++)
          dst[((size_t)y * Wo + x) * out_ch + c] = acc[c] * inv;
      }
    }
  }
  return err;
}

// ---------------------------------------------------------------------------
// Metrics
// ---------------------------------------------------------------------------

double tn_psnr(const float* a, const float* b, long n) {
  double mse = 0.0;
#pragma omp parallel for reduction(+ : mse)
  for (long i = 0; i < n; i++) {
    double d = (double)a[i] - (double)b[i];
    mse += d * d;
  }
  mse /= (double)n;
  if (mse < 1e-12) mse = 1e-12;
  return -10.0 * std::log10(mse);
}

// Gaussian-window SSIM (11x11, sigma 1.5), 'valid' padding, mean over
// channels — matches torchmetrics defaults / train.metrics.ssim.
double tn_ssim(const float* a, const float* b, int H, int W, int C) {
  const int K = 11, R = K / 2;
  double kern[K];
  double ksum = 0;
  for (int i = 0; i < K; i++) {
    double x = i - R;
    kern[i] = std::exp(-x * x / (2 * 1.5 * 1.5));
    ksum += kern[i];
  }
  for (int i = 0; i < K; i++) kern[i] /= ksum;
  const double c1 = 0.01 * 0.01, c2 = 0.03 * 0.03;
  int Ho = H - K + 1, Wo = W - K + 1;
  if (Ho <= 0 || Wo <= 0) return 0.0;
  double total = 0.0;
  for (int c = 0; c < C; c++) {
    // separable blur of 5 fields: a, b, a^2, b^2, ab
    std::vector<double> rows(5 * (size_t)H * Wo);
    double ssim_c = 0.0;
#pragma omp parallel
    {
#pragma omp for
      for (int y = 0; y < H; y++) {
        for (int x = 0; x < Wo; x++) {
          double s[5] = {0, 0, 0, 0, 0};
          for (int k = 0; k < K; k++) {
            double va = a[((size_t)y * W + x + k) * C + c];
            double vb = b[((size_t)y * W + x + k) * C + c];
            s[0] += kern[k] * va;
            s[1] += kern[k] * vb;
            s[2] += kern[k] * va * va;
            s[3] += kern[k] * vb * vb;
            s[4] += kern[k] * va * vb;
          }
          for (int f = 0; f < 5; f++)
            rows[(f * (size_t)H + y) * Wo + x] = s[f];
        }
      }
#pragma omp for reduction(+ : ssim_c)
      for (int y = 0; y < Ho; y++) {
        for (int x = 0; x < Wo; x++) {
          double s[5] = {0, 0, 0, 0, 0};
          for (int k = 0; k < K; k++)
            for (int f = 0; f < 5; f++)
              s[f] += kern[k] * rows[(f * (size_t)H + y + k) * Wo + x];
          double mx = s[0], my = s[1];
          double vx = s[2] - mx * mx, vy = s[3] - my * my;
          double cov = s[4] - mx * my;
          ssim_c += ((2 * mx * my + c1) * (2 * cov + c2)) /
                    ((mx * mx + my * my + c1) * (vx + vy + c2));
        }
      }
    }
    total += ssim_c / ((double)Ho * Wo);
  }
  return total / C;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Marching tetrahedra (OpenMP)
// ---------------------------------------------------------------------------
// Native counterpart of ops/meshing.py (which stands in for the reference's
// mcubes C++ extension, Trainer.save_mesh utils.py:738-758). Same 6-tet Kuhn
// decomposition and case enumeration as the Python implementation, so the two
// produce the same triangle soup (up to ordering).

namespace mt {

// cube vertex id bits -> (x, y, z) offsets
static const int kCubeOff[8][3] = {{0,0,0},{0,0,1},{0,1,0},{0,1,1},
                                   {1,0,0},{1,0,1},{1,1,0},{1,1,1}};
static const int kTets[6][4] = {{0,1,3,7},{0,1,5,7},{0,2,3,7},
                                {0,2,6,7},{0,4,5,7},{0,4,6,7}};
// tet edge ids: 0:(0,1) 1:(0,2) 2:(0,3) 3:(1,2) 4:(1,3) 5:(2,3)
static const int kTetEdges[6][2] = {{0,1},{0,2},{0,3},{1,2},{1,3},{2,3}};

struct CaseTable {
  int ntris[16];
  int tris[16][2][3];  // up to 2 triangles of tet-edge ids
  CaseTable() {
    auto eid = [](int a, int b) {
      if (a > b) { int t = a; a = b; b = t; }
      for (int i = 0; i < 6; i++)
        if (kTetEdges[i][0] == a && kTetEdges[i][1] == b) return i;
      return -1;
    };
    for (int m = 0; m < 16; m++) {
      int in[4], out[4], ni = 0, no = 0;
      for (int v = 0; v < 4; v++) (m >> v & 1) ? in[ni++] = v : out[no++] = v;
      ntris[m] = 0;
      if (ni == 1) {
        int i = in[0];
        int* t = tris[m][0];
        t[0] = eid(i, out[0]); t[1] = eid(i, out[1]); t[2] = eid(i, out[2]);
        ntris[m] = 1;
      } else if (ni == 3) {
        int o = out[0];
        int* t = tris[m][0];
        t[0] = eid(o, in[0]); t[1] = eid(o, in[2]); t[2] = eid(o, in[1]);
        ntris[m] = 1;
      } else if (ni == 2) {
        int i = in[0], j = in[1], k = out[0], l = out[1];
        int q0 = eid(i, k), q1 = eid(i, l), q2 = eid(j, l), q3 = eid(j, k);
        tris[m][0][0] = q0; tris[m][0][1] = q1; tris[m][0][2] = q2;
        tris[m][1][0] = q0; tris[m][1][1] = q2; tris[m][1][2] = q3;
        ntris[m] = 2;
      }
    }
  }
};
static const CaseTable kCases;

// triangles produced by one cube; writes up to 12 triangles (9 floats each)
// into out when out != nullptr. Returns the triangle count.
static inline int do_cube(const float* grid, int Y, int Z, int x, int y,
                          int z, float thresh, float* out) {
  float v[8];
  float px[8], py[8], pz[8];
  for (int c = 0; c < 8; c++) {
    int cx = x + kCubeOff[c][0], cy = y + kCubeOff[c][1], cz = z + kCubeOff[c][2];
    v[c] = grid[((long)cx * Y + cy) * Z + cz];
    px[c] = (float)cx; py[c] = (float)cy; pz[c] = (float)cz;
  }
  int n = 0;
  for (int t = 0; t < 6; t++) {
    const int* tet = kTets[t];
    int mask = 0;
    for (int c = 0; c < 4; c++) mask |= (v[tet[c]] > thresh) << c;
    int nt = kCases.ntris[mask];
    for (int k = 0; k < nt; k++) {
      if (out) {
        for (int e = 0; e < 3; e++) {
          int a = tet[kTetEdges[kCases.tris[mask][k][e]][0]];
          int b = tet[kTetEdges[kCases.tris[mask][k][e]][1]];
          float da = v[a], db = v[b];
          float denom = db - da;
          if (std::fabs(denom) < 1e-12f) denom = 1e-12f;
          float tt = (thresh - da) / denom;
          tt = tt < 0.f ? 0.f : (tt > 1.f ? 1.f : tt);
          float* o = out + (long)(n + k) * 9 + e * 3;
          o[0] = px[a] * (1 - tt) + px[b] * tt;
          o[1] = py[a] * (1 - tt) + py[b] * tt;
          o[2] = pz[a] * (1 - tt) + pz[b] * tt;
        }
      }
    }
    n += nt;
  }
  return n;
}

}  // namespace mt

// Count-or-emit marching tetrahedra over an (X, Y, Z) float grid.
// When out == nullptr: returns the total triangle count.
// When out != nullptr (capacity cap_tris): writes world-space triangle soup
// (n, 3 verts, 3 floats) with position = origin + grid_index * spacing and
// returns the number written (clamped to cap_tris).
extern "C" long tn_marching_tets(const float* grid, int X, int Y, int Z, float thresh,
                      float ox, float oy, float oz, float spacing,
                      float* out, long cap_tris) {
  int cx = X - 1, cy = Y - 1, cz = Z - 1;
  if (cx <= 0 || cy <= 0 || cz <= 0) return 0;
  std::vector<long> slab_counts(cx, 0);
#pragma omp parallel for schedule(dynamic, 1)
  for (int x = 0; x < cx; x++) {
    long c = 0;
    for (int y = 0; y < cy; y++)
      for (int z = 0; z < cz; z++)
        c += mt::do_cube(grid, Y, Z, x, y, z, thresh, nullptr);
    slab_counts[x] = c;
  }
  std::vector<long> offsets(cx + 1, 0);
  for (int x = 0; x < cx; x++) offsets[x + 1] = offsets[x] + slab_counts[x];
  long total = offsets[cx];
  if (!out) return total;

#pragma omp parallel for schedule(dynamic, 1)
  for (int x = 0; x < cx; x++) {
    long w = offsets[x];
    // one cube emits at most 12 triangles; stage into a scratch buffer so a
    // caller with cap_tris < total never sees writes past out + cap_tris * 9
    float scratch[12 * 9];
    for (int y = 0; y < cy; y++)
      for (int z = 0; z < cz; z++) {
        if (w >= cap_tris) break;
        long room = cap_tris - w;
        int n = mt::do_cube(grid, Y, Z, x, y, z, thresh, scratch);
        long take = n < room ? n : room;
        std::memcpy(out + w * 9, scratch, (size_t)take * 9 * sizeof(float));
        w += take;
      }
  }
  long written = total < cap_tris ? total : cap_tris;
#pragma omp parallel for
  for (long i = 0; i < written * 3; i++) {
    out[i * 3 + 0] = ox + out[i * 3 + 0] * spacing;
    out[i * 3 + 1] = oy + out[i * 3 + 1] * spacing;
    out[i * 3 + 2] = oz + out[i * 3 + 2] * spacing;
  }
  return written;
}
