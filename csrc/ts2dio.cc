// ts2dio — native host-side codec for totalsegmentator2d_tpu.
//
// Provides the byte-level hot paths of medical image IO (gzip/zlib inflate
// and deflate for NRRD/NIfTI/MetaImage payloads) as a small C library bound
// via ctypes (see totalsegmentator2d_tpu/io/native.py). The reference tool
// delegated this work to ITK's C++ IO factories; this is the in-tree
// TPU-VM-host equivalent.
//
// All functions return -1 on failure, otherwise the number of bytes written.

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

extern "C" {

// Upper bound for the inflated size of a gzip/zlib stream.
// For gzip streams the ISIZE trailer gives the size mod 2^32; for zlib (or
// multi-member/large streams) we run a counting inflate pass.
long long ts2dio_inflate_bound(const char* src, size_t src_len) {
  if (src_len < 2) return -1;
  const unsigned char* s = reinterpret_cast<const unsigned char*>(src);
  // single-member gzip fast path: trust ISIZE if it is plausible
  if (s[0] == 0x1f && s[1] == 0x8b && src_len >= 18) {
    uint32_t isize;
    std::memcpy(&isize, src + src_len - 4, 4);
    // ISIZE is mod 2^32; only trust it for payloads < 1 GiB expansion
    if (isize > 0 && isize < (1u << 30)) return static_cast<long long>(isize);
  }
  // counting pass
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 47) != Z_OK) return -1;
  zs.next_in = const_cast<Bytef*>(reinterpret_cast<const Bytef*>(src));
  zs.avail_in = static_cast<uInt>(src_len);
  std::vector<unsigned char> buf(1 << 20);
  long long total = 0;
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return -1;
    }
    total += static_cast<long long>(buf.size() - zs.avail_out);
    if (ret == Z_STREAM_END && zs.avail_in > 0) {
      // concatenated members: restart
      if (inflateReset2(&zs, 47) != Z_OK) break;
      ret = Z_OK;
    }
  }
  inflateEnd(&zs);
  return total;
}

long long ts2dio_inflate(const char* src, size_t src_len,
                         char* dst, size_t dst_cap) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 47) != Z_OK) return -1;  // 47: auto gzip/zlib
  zs.next_in = const_cast<Bytef*>(reinterpret_cast<const Bytef*>(src));
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = reinterpret_cast<Bytef*>(dst);
  zs.avail_out = static_cast<uInt>(dst_cap);
  long long total = 0;
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret == Z_STREAM_END && zs.avail_in > 0 && zs.avail_out > 0) {
      total = static_cast<long long>(dst_cap - zs.avail_out);
      if (inflateReset2(&zs, 47) != Z_OK) break;  // concatenated members
      ret = Z_OK;
      continue;
    }
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return -1;
    }
    if (zs.avail_out == 0 && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return -1;  // destination too small
    }
  }
  total = static_cast<long long>(dst_cap - zs.avail_out);
  // unconsumed input after the final stream end means the destination was
  // too small for a multi-member stream (e.g. an ISIZE-based bound that only
  // covered the last member) — fail so the caller can fall back
  if (zs.avail_in != 0) {
    inflateEnd(&zs);
    return -1;
  }
  inflateEnd(&zs);
  return total;
}

static long long deflate_impl(const char* src, size_t src_len,
                              char* dst, size_t dst_cap,
                              int level, int window_bits) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (level < 0 || level > 9) level = 1;
  if (deflateInit2(&zs, level, Z_DEFLATED, window_bits, 8,
                   Z_DEFAULT_STRATEGY) != Z_OK)
    return -1;
  zs.next_in = const_cast<Bytef*>(reinterpret_cast<const Bytef*>(src));
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = reinterpret_cast<Bytef*>(dst);
  zs.avail_out = static_cast<uInt>(dst_cap);
  int ret = deflate(&zs, Z_FINISH);
  long long out = static_cast<long long>(dst_cap - zs.avail_out);
  deflateEnd(&zs);
  return (ret == Z_STREAM_END) ? out : -1;
}

long long ts2dio_deflate_gzip(const char* src, size_t src_len,
                              char* dst, size_t dst_cap, int level) {
  return deflate_impl(src, src_len, dst, dst_cap, level, 31);  // 31: gzip
}

long long ts2dio_deflate_zlib(const char* src, size_t src_len,
                              char* dst, size_t dst_cap, int level) {
  return deflate_impl(src, src_len, dst, dst_cap, level, 15);  // 15: zlib
}

// ---------------------------------------------------------------------------
// Fused coronal projection: (Z, Y, X) C-order int16 volume -> per-(z, x)
// MAX and MEAN along Y in ONE pass (the CT serving hot path; reference
// tool.py:155-159 computes MIP and AIP separately through ITK). int16 max
// and int64 sums vectorize cleanly and make the mean EXACT; measured
// 6.7 ms vs numpy's 15.3 ms two-pass on a 49 MB torso CT. A float32
// variant was measured SLOWER than numpy (double-width accumulators) and
// was removed — float volumes take the numpy fallback.

}  // extern "C" (templates need C++ linkage)

template <typename T, typename MaxT, typename SumT>
static long long project_max_mean_impl(const T* vol, long long nz,
                                       long long ny, long long nx,
                                       float* out_max, float* out_mean) {
  if (nz <= 0 || ny <= 0 || nx <= 0) return -1;
  std::vector<MaxT> mx(static_cast<size_t>(nx));
  std::vector<SumT> sum(static_cast<size_t>(nx));
  for (long long z = 0; z < nz; ++z) {
    const T* first = vol + (z * ny) * nx;
    for (long long x = 0; x < nx; ++x) {
      mx[x] = static_cast<MaxT>(first[x]);
      sum[x] = static_cast<SumT>(first[x]);
    }
    for (long long y = 1; y < ny; ++y) {
      const T* row = vol + (z * ny + y) * nx;
      MaxT* __restrict m = mx.data();
      SumT* __restrict a = sum.data();
      for (long long x = 0; x < nx; ++x) {
        MaxT v = static_cast<MaxT>(row[x]);
        m[x] = v > m[x] ? v : m[x];  // branchless -> SIMD max
        a[x] += static_cast<SumT>(row[x]);
      }
    }
    float* om = out_max + z * nx;
    float* oe = out_mean + z * nx;
    const double inv = 1.0 / static_cast<double>(ny);
    for (long long x = 0; x < nx; ++x) {
      om[x] = static_cast<float>(mx[x]);
      oe[x] = static_cast<float>(static_cast<double>(sum[x]) * inv);
    }
  }
  return nz * nx;
}

extern "C" {

long long ts2dio_project_max_mean_i16(const int16_t* vol, long long nz,
                                      long long ny, long long nx,
                                      float* out_max, float* out_mean) {
  // int16 max + int64 sum vectorize cleanly and the sum is EXACT
  // (|sum| <= ny * 32768 fits int64 for any real volume)
  return project_max_mean_impl<int16_t, int16_t, long long>(
      vol, nz, ny, nx, out_max, out_mean);
}

// ---------------------------------------------------------------------------
// JPEG Lossless (T.81 process 14) difference-stream decoder: the serial
// Huffman hot loop of io/jpegll.py. ``lut`` is the 64k-entry peek table
// (lut[next16bits] = (SSSS << 5) | code_length) built on the Python side
// from the DHT segment; ``seg`` is one unstuffed entropy segment (FF00
// resolved, RSTn removed). Returns ``count`` on success, -1 on an invalid
// code. Reconstruction (predictors/cumsum) stays in numpy — it is already
// vectorized there and depends on scan parameters this function need not
// know about. Returns -4 when the segment ends before ``count`` samples
// are coded (zero-pad bits, pushed only after the real bytes ran out, got
// consumed — decoding them would fabricate pixels from a truncated file).

long long ts2dio_jpegll_decode_diffs(const char* seg, size_t seg_len,
                                     const uint32_t* lut, int32_t* out,
                                     long long count) {
  const unsigned char* s = reinterpret_cast<const unsigned char*>(seg);
  uint64_t acc = 0;
  int nbits = 0;
  int pad_bits = 0;
  size_t pos = 0;
  for (long long i = 0; i < count; ++i) {
    while (nbits < 32) {
      if (pos < seg_len) {
        acc = (acc << 8) | s[pos++];
      } else {
        acc <<= 8;
        pad_bits += 8;
      }
      nbits += 8;
    }
    uint32_t entry = lut[(acc >> (nbits - 16)) & 0xFFFF];
    int len = static_cast<int>(entry & 0x1F);
    if (len == 0) return -1;  // invalid code
    int ssss = static_cast<int>(entry >> 5);
    nbits -= len;
    if (ssss == 0) {
      out[i] = 0;
    } else if (ssss == 16) {
      out[i] = 32768;
    } else {
      uint32_t extra =
          static_cast<uint32_t>((acc >> (nbits - ssss)) & ((1u << ssss) - 1));
      nbits -= ssss;
      // T.81 "extend": the low half of each category codes negatives
      out[i] = (extra < (1u << (ssss - 1)))
                   ? static_cast<int32_t>(extra) - ((1 << ssss) - 1)
                   : static_cast<int32_t>(extra);
    }
    acc &= (nbits >= 64) ? ~0ull : ((1ull << nbits) - 1);
  }
  if (pad_bits > nbits) return -4;  // truncated entropy segment
  return count;
}

// ---------------------------------------------------------------------------
// Sequential-DCT JPEG (T.81 processes 1-2) block decoder: the serial
// Huffman hot loop of io/jpegdct.py. ``dc_lut``/``ac_lut`` are 64k-entry
// peek tables (lut[next16bits] = (symbol << 5) | code_length) built on the
// Python side; ``seg`` is one unstuffed entropy segment. ``out`` is an
// (nblocks, 64) int32 array, ZEROED by the caller, receiving quantized
// coefficients in zigzag order with DC prediction applied. Returns
// ``nblocks`` on success, -2 on an invalid Huffman code, -3 on an AC run
// past the end of a block, -4 on a truncated entropy segment (zero-pad
// bits got consumed). Dequantization/IDCT stay in numpy — vectorized
// over all blocks at once.

long long ts2dio_jpegdct_decode_blocks(const char* seg, size_t seg_len,
                                       const uint32_t* dc_lut,
                                       const uint32_t* ac_lut, int32_t* out,
                                       long long nblocks) {
  const unsigned char* s = reinterpret_cast<const unsigned char*>(seg);
  uint64_t acc = 0;
  int nbits = 0;
  int pad_bits = 0;
  size_t pos = 0;
  int32_t pred = 0;
  for (long long b = 0; b < nblocks; ++b) {
    int32_t* row = out + b * 64;
    // DC coefficient: category + extend
    while (nbits < 32) {
      if (pos < seg_len) {
        acc = (acc << 8) | s[pos++];
      } else {
        acc <<= 8;
        pad_bits += 8;
      }
      nbits += 8;
    }
    uint32_t entry = dc_lut[(acc >> (nbits - 16)) & 0xFFFF];
    int len = static_cast<int>(entry & 0x1F);
    if (len == 0) return -2;
    int ssss = static_cast<int>(entry >> 5);
    nbits -= len;
    if (ssss) {
      uint32_t extra =
          static_cast<uint32_t>((acc >> (nbits - ssss)) & ((1u << ssss) - 1));
      nbits -= ssss;
      pred += (extra < (1u << (ssss - 1)))
                  ? static_cast<int32_t>(extra) - ((1 << ssss) - 1)
                  : static_cast<int32_t>(extra);
    }
    row[0] = pred;
    // AC coefficients: (run, size) pairs until EOB or k = 63
    int k = 1;
    while (k < 64) {
      while (nbits < 32) {
        if (pos < seg_len) {
          acc = (acc << 8) | s[pos++];
        } else {
          acc <<= 8;
          pad_bits += 8;
        }
        nbits += 8;
      }
      entry = ac_lut[(acc >> (nbits - 16)) & 0xFFFF];
      len = static_cast<int>(entry & 0x1F);
      if (len == 0) return -2;
      int sym = static_cast<int>(entry >> 5);
      nbits -= len;
      int run = sym >> 4;
      int size = sym & 0x0F;
      if (size == 0) {
        if (run == 15) {  // ZRL: sixteen zeros
          k += 16;
          continue;
        }
        break;  // EOB
      }
      k += run;
      if (k > 63) return -3;
      uint32_t extra =
          static_cast<uint32_t>((acc >> (nbits - size)) & ((1u << size) - 1));
      nbits -= size;
      row[k] = (extra < (1u << (size - 1)))
                   ? static_cast<int32_t>(extra) - ((1 << size) - 1)
                   : static_cast<int32_t>(extra);
      ++k;
    }
    acc &= (nbits >= 64) ? ~0ull : ((1ull << nbits) - 1);
  }
  if (pad_bits > nbits) return -4;  // truncated entropy segment
  return nblocks;
}

}  // extern "C"
