// Native host runtime for the TPU Huffman framework.
//
// The reference implements its host side in C++ (container writer
// Compressor.cu:634-700, sequential decoder Decompressor.cu:12-291, CPU
// two-queue builder baseline/Compressor.cu:118-164). This library is the
// framework's native-performance equivalent of those host components —
// an independent implementation around canonical codes and table-driven
// decode (no pointer-chasing tree walk), exposed through a plain C ABI
// for ctypes (no pybind11 in this environment).
//
// Components:
//   htpu_code_lengths        — O(n) two-queue optimal code lengths
//   htpu_ref_compress        — reference-format ".compressed" writer
//   htpu_ref_decompress      — reference-format reader/decoder (handles
//                              arbitrary prefix codes, not just canonical)
//   htpu_interleave_build    — encoder-side decoder simulation producing
//                              the group-interleaved stream consumed by
//                              the Pallas lane decoder
//   htpu_interleave_decode   — CPU twin of the Pallas group decoder
//
// Error codes: 0 ok; <0 = HTPU_E_* below.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#define HTPU_API extern "C" __attribute__((visibility("default")))

enum {
  HTPU_OK = 0,
  HTPU_E_ARGS = -1,
  HTPU_E_TRUNCATED = -2,
  HTPU_E_BAD_CODE = -3,
  HTPU_E_OVERFLOW = -4,
  HTPU_E_INVARIANT = -5,
};

namespace {

constexpr int kMaxSymbols = 65536;
constexpr int kMaxCodeLen = 32;

int num_threads(int64_t work_items, int64_t min_per_thread) {
  const char* env = std::getenv("HTPU_THREADS");
  int hw = env ? std::atoi(env) : (int)std::thread::hardware_concurrency();
  if (hw < 1) hw = 1;
  int64_t by_work = work_items / std::max<int64_t>(min_per_thread, 1);
  return (int)std::max<int64_t>(1, std::min<int64_t>(hw, by_work));
}

template <typename F>
void parallel_for(int64_t n, int64_t min_per_thread, F&& f) {
  int nt = num_threads(n, min_per_thread);
  if (nt <= 1) {
    f(0, n, 0);
    return;
  }
  std::vector<std::thread> ts;
  int64_t per = (n + nt - 1) / nt;
  for (int i = 0; i < nt; ++i) {
    int64_t a = i * per, b = std::min<int64_t>(n, a + per);
    if (a >= b) break;
    ts.emplace_back([&f, a, b, i] { f(a, b, i); });
  }
  for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// Bit I/O (MSB-first, matching the reference's stream convention)
// ---------------------------------------------------------------------------

struct BitWriter {
  uint8_t* out;
  int64_t cap;
  int64_t n = 0;
  uint64_t acc = 0;
  int bits = 0;
  bool overflow = false;

  void write(uint64_t v, int nb) {
    // invariant: bits <= 7 on entry, nb <= 56
    acc = (acc << nb) | (v & ((nb == 64) ? ~0ull : ((1ull << nb) - 1)));
    bits += nb;
    while (bits >= 8) {
      bits -= 8;
      if (n >= cap) { overflow = true; return; }
      out[n++] = (uint8_t)(acc >> bits);
    }
    acc &= (1ull << bits) - 1;
  }

  // Final partial byte left-aligned (reference flush, Compressor.cu:597-601)
  bool flush() {
    if (bits) {
      if (n >= cap) { overflow = true; return false; }
      out[n++] = (uint8_t)(acc << (8 - bits));
      acc = 0;
      bits = 0;
    }
    return !overflow;
  }
};

// Peek 64 bits at absolute bit position `pos` from a buffer that the caller
// padded with >= 9 readable bytes past the last meaningful bit.
static inline uint64_t peek64(const uint8_t* p, int64_t pos) {
  uint64_t x;
  std::memcpy(&x, p + (pos >> 3), 8);
  x = __builtin_bswap64(x);
  int s = (int)(pos & 7);
  if (s) x = (x << s) | (uint64_t)(p[(pos >> 3) + 8] >> (8 - s));
  return x;
}

// ---------------------------------------------------------------------------
// Two-queue optimal code lengths (canonical-ready)
// ---------------------------------------------------------------------------

// Same contract and tie-breaking as codebook.code_lengths_from_frequencies:
// leaves ascending by (freq, symbol); merge ties prefer the internal node
// (can deepen trees, but reproduces the reference's exact sizes — part of
// the interop contract pinned by tests);
// single-symbol alphabets get length 1 (fixing the reference's silent
// empty-output bug for such inputs, SURVEY.md §4).
static int code_lengths(const int64_t* freqs, uint8_t* lengths) {
  std::vector<int> present;
  present.reserve(4096);
  for (int s = 0; s < kMaxSymbols; ++s) {
    if (freqs[s] < 0) return HTPU_E_ARGS;
    if (freqs[s] > 0) present.push_back(s);
  }
  std::memset(lengths, 0, kMaxSymbols);
  int64_t n = (int64_t)present.size();
  if (n == 0) return HTPU_OK;
  if (n == 1) {
    lengths[present[0]] = 1;
    return HTPU_OK;
  }
  std::sort(present.begin(), present.end(), [&](int a, int b) {
    if (freqs[a] != freqs[b]) return freqs[a] < freqs[b];
    return a < b;
  });
  std::vector<int64_t> leaf_freq(n);
  for (int64_t i = 0; i < n; ++i) leaf_freq[i] = freqs[present[i]];

  std::vector<int64_t> int_freq(n - 1), left(n - 1), right(n - 1);
  int64_t li = 0, ii = 0;
  for (int64_t k = 0; k < n - 1; ++k) {
    int64_t id[2], f[2];
    for (int j = 0; j < 2; ++j) {
      bool take_leaf = li < n && (ii >= k || leaf_freq[li] < int_freq[ii]);
      if (take_leaf) {
        id[j] = li; f[j] = leaf_freq[li]; ++li;
      } else {
        id[j] = n + ii; f[j] = int_freq[ii]; ++ii;
      }
    }
    int_freq[k] = f[0] + f[1];
    left[k] = id[0];
    right[k] = id[1];
  }

  std::vector<int32_t> depth(2 * n - 1, 0);
  for (int64_t k = n - 2; k >= 0; --k) {
    int32_t d = depth[n + k] + 1;
    depth[left[k]] = d;
    depth[right[k]] = d;
  }

  int32_t maxd = 0;
  for (int64_t i = 0; i < n; ++i) maxd = std::max(maxd, depth[i]);
  if (maxd > kMaxCodeLen) {
    // Boundary package-merge: OPTIMAL length-limited lengths, mirroring
    // codebook._limit_lengths operation-for-operation (same float64
    // arithmetic, same stable leaf-before-package tie order) so the
    // Python and native builders stay bit-identical on these inputs.
    // A clamp-then-deepen repair is not enough: it can miss the Kraft
    // EQUALITY the canonical builders require.
    std::vector<double> leaf_w(leaf_freq.begin(), leaf_freq.end());
    std::vector<std::vector<uint8_t>> flags((size_t)kMaxCodeLen);
    std::vector<double> cur = leaf_w;
    flags[0].assign((size_t)n, 0);
    for (int lvl = 1; lvl < kMaxCodeLen; ++lvl) {
      int64_t m = (int64_t)cur.size() & ~1ll;
      std::vector<double> pk((size_t)(m / 2));
      for (int64_t i = 0; i < m / 2; ++i) pk[(size_t)i] = cur[(size_t)(2 * i)] + cur[(size_t)(2 * i + 1)];
      std::vector<double> w;
      std::vector<uint8_t> f;
      w.reserve((size_t)n + pk.size());
      f.reserve((size_t)n + pk.size());
      int64_t a = 0, b = 0;
      while (a < n || b < (int64_t)pk.size()) {
        bool take_leaf =
            b >= (int64_t)pk.size() || (a < n && leaf_w[(size_t)a] <= pk[(size_t)b]);
        if (take_leaf) { w.push_back(leaf_w[(size_t)a++]); f.push_back(0); }
        else { w.push_back(pk[(size_t)b++]); f.push_back(1); }
      }
      cur.swap(w);
      flags[(size_t)lvl].swap(f);
    }
    for (int64_t i = 0; i < n; ++i) depth[i] = 0;
    int64_t c = 2 * n - 2;
    for (int lvl = kMaxCodeLen - 1; lvl >= 0; --lvl) {
      const auto& fl = flags[(size_t)lvl];
      int64_t p = 0;
      for (int64_t i = 0; i < c && i < (int64_t)fl.size(); ++i) p += fl[(size_t)i];
      int64_t m = c - p;
      for (int64_t r = 0; r < m && r < n; ++r) depth[r] += 1;
      c = 2 * p;
    }
  }
  for (int64_t i = 0; i < n; ++i) lengths[present[i]] = (uint8_t)depth[i];
  return HTPU_OK;
}

// Canonical code assignment from a dense length table. Fills codes[] (right
// justified) and sym_order (canonical (length, symbol) order); returns the
// unique count, or <0 on Kraft violation.
static int64_t canonical_codes(const uint8_t* lengths, uint32_t* codes,
                               int32_t* sym_order_out) {
  int64_t counts[kMaxCodeLen + 1] = {0};
  int64_t n = 0;
  for (int s = 0; s < kMaxSymbols; ++s) {
    if (lengths[s] > kMaxCodeLen) return HTPU_E_BAD_CODE;
    if (lengths[s]) { counts[lengths[s]]++; n++; }
  }
  int64_t first[kMaxCodeLen + 2] = {0};
  for (int l = 1; l <= kMaxCodeLen; ++l)
    first[l + 1] = (first[l] + counts[l]) << 1;
  int64_t next[kMaxCodeLen + 1];
  std::memcpy(next, first, sizeof(next));
  int64_t k = 0;
  for (int l = 1; l <= kMaxCodeLen; ++l) {
    for (int s = 0; s < kMaxSymbols; ++s) {
      if (lengths[s] == l) {
        codes[s] = (uint32_t)next[l]++;
        if (sym_order_out) sym_order_out[k] = s;
        ++k;
      }
    }
  }
  return n;
}

}  // namespace

// ---------------------------------------------------------------------------
// Public: code lengths
// ---------------------------------------------------------------------------

HTPU_API int htpu_code_lengths(const int64_t* freqs, uint8_t* lengths) {
  if (!freqs || !lengths) return HTPU_E_ARGS;
  return code_lengths(freqs, lengths);
}

// ---------------------------------------------------------------------------
// Public: reference-format compress
// ---------------------------------------------------------------------------

// Worst case output: 4B prefix + per-symbol (16+8+32 bits = 7B) + 8B size +
// payload (<= 32 bits/pair) + slack.
HTPU_API int64_t htpu_ref_compress_bound(int64_t data_len) {
  int64_t n_pairs = data_len / 2;
  return 16 + (int64_t)kMaxSymbols * 7 + n_pairs * 4 + 16;
}

HTPU_API int htpu_ref_compress(const uint8_t* data, int64_t data_len,
                               uint8_t* out, int64_t out_cap,
                               int64_t* out_len) {
  if ((!data && data_len) || !out || !out_len) return HTPU_E_ARGS;
  int64_t n_pairs = data_len / 2;
  bool is_odd = (data_len & 1) != 0;

  // Histogram over little-endian byte pairs (symbol model per
  // reference Compressor.cu:45).
  std::vector<int64_t> freqs(kMaxSymbols, 0);
  for (int64_t i = 0; i < n_pairs; ++i) {
    uint16_t sym = (uint16_t)(data[2 * i] | (data[2 * i + 1] << 8));
    freqs[sym]++;
  }

  std::vector<uint8_t> lengths(kMaxSymbols);
  int rc = code_lengths(freqs.data(), lengths.data());
  if (rc != HTPU_OK) return rc;
  std::vector<uint32_t> codes(kMaxSymbols, 0);
  std::vector<int32_t> sym_order(kMaxSymbols);
  int64_t n_unique = canonical_codes(lengths.data(), codes.data(), sym_order.data());
  if (n_unique < 0) return (int)n_unique;

  BitWriter w{out, out_cap};
  bool emit_dummy = n_unique == 0;
  int count_field = emit_dummy ? 1 : (int)(n_unique & 0xFFFF);  // 65536 wraps to 0
  w.write((uint64_t)(count_field & 0xFF), 8);
  w.write((uint64_t)((count_field >> 8) & 0xFF), 8);
  w.write(is_odd ? 1 : 0, 8);
  if (is_odd) w.write(data[data_len - 1], 8);

  if (emit_dummy) {
    // Table must be non-empty (count 0 means 65536 to the reference reader).
    w.write(0, 16);
    w.write(1, 8);
    w.write(0, 1);
  } else {
    // Emit ascending (freq, symbol) — matches the Python writer bit for bit.
    std::vector<int32_t> order(sym_order.begin(), sym_order.begin() + n_unique);
    std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
      if (freqs[a] != freqs[b]) return freqs[a] < freqs[b];
      return a < b;
    });
    for (int32_t s : order) {
      w.write((uint64_t)s, 16);
      w.write(lengths[s], 8);
      w.write(codes[s], lengths[s]);
    }
  }

  for (int i = 0; i < 8; ++i)
    w.write((uint64_t)((data_len >> (8 * i)) & 0xFF), 8);
  if (w.overflow) return HTPU_E_OVERFLOW;

  // Payload: chunked two-pass parallel pack. Pass 1 sums bits per chunk,
  // a serial scan places each chunk's absolute bit offset, pass 2 packs
  // chunks into thread-local buffers OR-merged into the output (codewords
  // occupy disjoint bit ranges, so byte-OR across seams is exact; each
  // chunk's first byte is deferred and applied serially to avoid races on
  // shared seam bytes).
  int64_t start_bit = w.n * 8 + w.bits;
  int nt = num_threads(n_pairs, 1 << 18);
  int64_t per = n_pairs ? (n_pairs + nt - 1) / nt : 0;
  std::vector<int64_t> chunk_bits((size_t)nt, 0);
  parallel_for(nt, 1, [&](int64_t a, int64_t b, int) {
    for (int64_t c = a; c < b; ++c) {
      int64_t lo = c * per, hi = std::min<int64_t>(n_pairs, lo + per);
      int64_t bits = 0;
      for (int64_t i = lo; i < hi; ++i)
        bits += lengths[data[2 * i] | (data[2 * i + 1] << 8)];
      chunk_bits[(size_t)c] = bits;
    }
  });
  std::vector<int64_t> chunk_start((size_t)nt + 1);
  chunk_start[0] = start_bit;
  for (int c = 0; c < nt; ++c)
    chunk_start[(size_t)c + 1] = chunk_start[(size_t)c] + chunk_bits[(size_t)c];
  int64_t total_bits = chunk_start[(size_t)nt];
  int64_t total_bytes = (total_bits + 7) >> 3;
  if (total_bytes > out_cap) return HTPU_E_OVERFLOW;

  // Materialize the header's partial byte, zero the payload region.
  int64_t hdr_bytes = w.n;
  if (w.bits) out[hdr_bytes] = (uint8_t)(w.acc << (8 - w.bits));
  std::memset(out + hdr_bytes + (w.bits ? 1 : 0), 0,
              (size_t)(total_bytes - hdr_bytes - (w.bits ? 1 : 0)));

  std::vector<uint8_t> first_byte((size_t)nt, 0);
  std::vector<int64_t> first_pos((size_t)nt, -1);
  std::atomic<int> err{HTPU_OK};
  parallel_for(nt, 1, [&](int64_t a, int64_t b, int) {
    for (int64_t c = a; c < b; ++c) {
      int64_t lo = c * per, hi = std::min<int64_t>(n_pairs, lo + per);
      if (lo >= hi) continue;
      int64_t sb = chunk_start[(size_t)c];
      std::vector<uint8_t> local((size_t)(chunk_bits[(size_t)c] / 8 + 16), 0);
      BitWriter lw{local.data(), (int64_t)local.size()};
      lw.write(0, (int)(sb & 7));  // align to the absolute bit offset
      for (int64_t i = lo; i < hi; ++i) {
        uint16_t sym = (uint16_t)(data[2 * i] | (data[2 * i + 1] << 8));
        lw.write(codes[sym], lengths[sym]);
        if (lw.overflow) { err = HTPU_E_OVERFLOW; return; }
      }
      if (!lw.flush()) { err = HTPU_E_OVERFLOW; return; }
      int64_t base = sb >> 3;
      first_pos[(size_t)c] = base;
      first_byte[(size_t)c] = lw.n ? local[0] : 0;
      // Bytes past the first are exclusively this chunk's except the last,
      // which the NEXT chunk defers — safe to OR now.
      for (int64_t k = 1; k < lw.n; ++k) out[base + k] |= local[(size_t)k];
    }
  });
  if (err.load() != HTPU_OK) return err.load();
  for (int c = 0; c < nt; ++c)
    if (first_pos[(size_t)c] >= 0) out[first_pos[(size_t)c]] |= first_byte[(size_t)c];
  *out_len = total_bytes;
  return HTPU_OK;
}

// ---------------------------------------------------------------------------
// Public: reference-format decompress
// ---------------------------------------------------------------------------

namespace {

struct BitReader {
  const uint8_t* p;
  int64_t nbits;
  int64_t pos = 0;

  bool ok(int64_t nb) const { return pos + nb <= nbits; }

  uint64_t read(int nb) {
    uint64_t v = 0;
    int64_t q = pos;
    int rem = nb;
    while (rem > 0) {
      int avail = 8 - (int)(q & 7);
      int take = std::min(avail, rem);
      uint8_t byte = p[q >> 3];
      v = (v << take) | ((byte >> (avail - take)) & ((1u << take) - 1));
      q += take;
      rem -= take;
    }
    pos = q;
    return v;
  }
};

}  // namespace

// Parses the header only; returns the original file size (so the caller can
// size the output buffer), or <0 on error.
HTPU_API int64_t htpu_ref_original_size(const uint8_t* blob, int64_t blob_len) {
  if (!blob || blob_len < 3) return HTPU_E_TRUNCATED;
  int64_t count = blob[0] | ((int64_t)blob[1] << 8);
  if (count == 0) count = 65536;
  bool is_odd = blob[2] != 0;
  int64_t pos = is_odd ? 4 : 3;
  if (blob_len < pos) return HTPU_E_TRUNCATED;
  BitReader r{blob, blob_len * 8, pos * 8};
  for (int64_t i = 0; i < count; ++i) {
    if (!r.ok(24)) return HTPU_E_TRUNCATED;
    r.read(16);
    int64_t len = (int64_t)r.read(8);
    if (len == 0) len = 65536;
    if (len > 64) return HTPU_E_BAD_CODE;
    if (!r.ok(len)) return HTPU_E_TRUNCATED;
    r.read((int)len);
  }
  if (!r.ok(64)) return HTPU_E_TRUNCATED;
  int64_t file_size = 0;
  for (int i = 0; i < 8; ++i) file_size |= (int64_t)r.read(8) << (8 * i);
  // Sanity vs the payload actually present: each pair consumes >= 1 bit,
  // so a hostile/corrupt size field can't demand more than 2 bytes per
  // remaining payload bit (prevents giant caller allocations).
  if (file_size < 0 || file_size / 2 > (blob_len * 8 - r.pos) + 8)
    return HTPU_E_TRUNCATED;
  return file_size;
}

HTPU_API int htpu_ref_decompress(const uint8_t* blob, int64_t blob_len,
                                 uint8_t* out, int64_t out_cap,
                                 int64_t* out_len) {
  if (!blob || !out_len) return HTPU_E_ARGS;
  if (blob_len < 3) return HTPU_E_TRUNCATED;
  int64_t count = blob[0] | ((int64_t)blob[1] << 8);
  if (count == 0) count = 65536;
  bool is_odd = blob[2] != 0;
  uint8_t last_byte = 0;
  int64_t pos_bytes = 3;
  if (is_odd) {
    if (blob_len < 4) return HTPU_E_TRUNCATED;
    last_byte = blob[3];
    pos_bytes = 4;
  }

  // Header: per-symbol (symbol, length, code). Codes may be arbitrary
  // prefix codes (the reference's own tree assignment), up to 64 bits.
  std::vector<uint16_t> syms((size_t)count);
  std::vector<uint8_t> lens((size_t)count);
  std::vector<uint64_t> lj((size_t)count);  // left-justified in 64 bits
  BitReader r{blob, blob_len * 8, pos_bytes * 8};
  for (int64_t i = 0; i < count; ++i) {
    if (!r.ok(24)) return HTPU_E_TRUNCATED;
    syms[i] = (uint16_t)r.read(16);
    int64_t len = (int64_t)r.read(8);
    if (len == 0) len = 65536;
    if (len > 64) return HTPU_E_BAD_CODE;
    if (!r.ok(len)) return HTPU_E_TRUNCATED;
    uint64_t code = r.read((int)len);
    lens[i] = (uint8_t)len;
    lj[i] = (len == 64) ? code : (code << (64 - len));
  }
  if (!r.ok(64)) return HTPU_E_TRUNCATED;
  int64_t file_size = 0;
  for (int i = 0; i < 8; ++i) file_size |= (int64_t)r.read(8) << (8 * i);
  int64_t n_pairs = file_size / 2;
  if (file_size < 0 || n_pairs > (blob_len * 8 - r.pos) + 8)
    return HTPU_E_TRUNCATED;  // each pair consumes >= 1 payload bit
  if (file_size > out_cap) return HTPU_E_OVERFLOW;

  // Sort codewords by left-justified value; in a prefix-free code the
  // match for a 64-bit peek P is the greatest lj <= P (same primitive the
  // device decoder uses, SURVEY.md §7). A 16-bit root table narrows the
  // binary search to (almost always) a single candidate.
  std::vector<int32_t> order((size_t)count);
  for (int64_t i = 0; i < count; ++i) order[i] = (int32_t)i;
  std::sort(order.begin(), order.end(),
            [&](int32_t a, int32_t b) { return lj[a] < lj[b]; });
  std::vector<uint64_t> lj_s((size_t)count);
  std::vector<uint16_t> sym_s((size_t)count);
  std::vector<uint8_t> len_s((size_t)count);
  for (int64_t i = 0; i < count; ++i) {
    lj_s[i] = lj[order[i]];
    sym_s[i] = syms[order[i]];
    len_s[i] = lens[order[i]];
  }
  std::vector<int32_t> root(65537);
  {
    int64_t j = 0;
    for (int64_t v = 0; v < 65536; ++v) {
      uint64_t key = (uint64_t)v << 48;
      while (j < count && lj_s[j] < key) ++j;
      root[v] = (int32_t)j;  // first index with lj >= v << 48
    }
    root[65536] = (int32_t)count;
  }

  // Fast path: a 12-bit direct table for peeks whose top 12 bits uniquely
  // identify the codeword (true for every code of <= 12 bits and for any
  // longer code owning its 12-bit prefix alone). Entry = sym << 8 | len;
  // 0xFFFFFFFF falls back to the range binary search.
  constexpr int kFastBits = 12;
  std::vector<uint32_t> fast((size_t)1 << kFastBits, 0xFFFFFFFFu);
  {
    int64_t j = 0;
    for (uint32_t v = 0; v < (1u << kFastBits); ++v) {
      uint64_t lo_key = (uint64_t)v << (64 - kFastBits);
      uint64_t hi_key = lo_key | (~0ull >> kFastBits);
      while (j < count && lj_s[j] < lo_key) ++j;
      // candidate for the whole bucket: greatest lj <= lo_key
      int64_t idx = j - 1 + (j < count && lj_s[j] == lo_key ? 1 : 0);
      if (idx < 0) continue;
      // unique iff no other codeword boundary falls inside the bucket
      int64_t nxt = idx + 1;
      if (nxt < count && lj_s[nxt] <= hi_key) continue;
      fast[v] = ((uint32_t)sym_s[idx] << 8) | len_s[idx];
    }
  }

  // Payload bit cursor; pad the source so peek64 never reads past the end.
  int64_t payload_pos = r.pos;
  std::vector<uint8_t> padded((size_t)blob_len + 16, 0);
  std::memcpy(padded.data(), blob, (size_t)blob_len);
  const uint8_t* src = padded.data();

  // In-loop cursor bound: decoding must never walk past the final byte
  // (+7 bits of left-aligned flush slack). Bounds also keep peek64 inside
  // the 16-byte padding: pos < blob_len*8+8 => (pos>>3)+9 <= blob_len+10.
  const int64_t pos_limit = blob_len * 8 + 8;
  int64_t pos = payload_pos;
  for (int64_t i = 0; i < n_pairs; ++i) {
    if (pos >= pos_limit) return HTPU_E_TRUNCATED;
    uint64_t peek = peek64(src, pos);
    uint32_t e = fast[peek >> (64 - kFastBits)];
    if (e != 0xFFFFFFFFu) {
      out[2 * i] = (uint8_t)((e >> 8) & 0xFF);
      out[2 * i + 1] = (uint8_t)(e >> 16);
      pos += e & 0xFF;
      continue;
    }
    int32_t lo = root[peek >> 48];
    int32_t hi = root[(peek >> 48) + 1];
    // greatest index in [lo, hi) with lj_s <= peek; fallback lo-1.
    int32_t idx = lo - 1;
    while (lo < hi) {
      int32_t mid = (lo + hi) >> 1;
      if (lj_s[mid] <= peek) { idx = mid; lo = mid + 1; }
      else hi = mid;
    }
    if (idx < 0) return HTPU_E_BAD_CODE;
    out[2 * i] = (uint8_t)(sym_s[idx] & 0xFF);
    out[2 * i + 1] = (uint8_t)(sym_s[idx] >> 8);
    pos += len_s[idx];
  }
  if (pos > blob_len * 8 + 7) return HTPU_E_TRUNCATED;
  if (is_odd) out[file_size - 1] = last_byte;
  *out_len = file_size;
  return HTPU_OK;
}

// ---------------------------------------------------------------------------
// Public: interleaved stream build (encoder-side decoder simulation)
// ---------------------------------------------------------------------------

namespace {
constexpr int kGroupLanes = 1024;
constexpr int kPreloadWords = 2;
constexpr int kRefillThreshold = 33;
}

// slab:      (n_lanes, W) uint32 per-lane packed words (row-major)
// eff_lens:  (n_lanes, B) int32 per-step consumed bits (row-major)
// out:       caller buffer; streams of all groups written back to back,
//            each starting with its 2*1024 preload words
// group_sizes: (n_lanes/1024,) int64 word count per group
HTPU_API int htpu_interleave_build(const uint32_t* slab, int64_t n_lanes,
                                   int64_t W, const int32_t* eff_lens,
                                   int64_t B, int64_t n_real,
                                   uint32_t* out, int64_t out_cap,
                                   int64_t* group_sizes) {
  if (!slab || !eff_lens || !out || !group_sizes) return HTPU_E_ARGS;
  if (n_lanes % kGroupLanes) return HTPU_E_ARGS;
  int64_t n_groups = n_lanes / kGroupLanes;

  // Pass 1 (parallel over groups): exact stream sizes in closed form —
  // a real lane consumes total_bits >> 5 refill words.
  std::vector<int64_t> offsets((size_t)n_groups + 1, 0);
  std::atomic<int> err{HTPU_OK};
  parallel_for(n_groups, 1, [&](int64_t a, int64_t b, int) {
    for (int64_t g = a; g < b; ++g) {
      int64_t lane0 = g * kGroupLanes, words = kPreloadWords * kGroupLanes;
      for (int l = 0; l < kGroupLanes; ++l) {
        if (lane0 + l >= n_real) continue;
        int64_t cum = 0;
        const int32_t* e = eff_lens + (lane0 + l) * B;
        for (int64_t t = 0; t < B; ++t) cum += e[t];
        words += cum >> 5;
      }
      group_sizes[g] = words;
    }
  });
  for (int64_t g = 0; g < n_groups; ++g)
    offsets[(size_t)g + 1] = offsets[(size_t)g] + group_sizes[g];
  if (offsets[(size_t)n_groups] > out_cap) return HTPU_E_OVERFLOW;

  // Pass 2 (parallel over groups): simulate each group independently.
  parallel_for(n_groups, 1, [&](int64_t a, int64_t b, int) {
    std::vector<int64_t> bits(kGroupLanes);
    std::vector<int32_t> nxt(kGroupLanes);
    for (int64_t g = a; g < b; ++g) {
      int64_t lane0 = g * kGroupLanes;
      uint32_t* dst = out + offsets[(size_t)g];
      int64_t n = 0;
      for (int p = 0; p < kPreloadWords; ++p)
        for (int l = 0; l < kGroupLanes; ++l)
          dst[n++] = (p < W) ? slab[(lane0 + l) * W + p] : 0;
      for (int l = 0; l < kGroupLanes; ++l) {
        bits[l] = (lane0 + l < n_real) ? 64 : (int64_t)1 << 30;
        nxt[l] = kPreloadWords;
      }
      for (int64_t t = 0; t < B; ++t) {
        for (int l = 0; l < kGroupLanes; ++l) {
          bits[l] -= eff_lens[(lane0 + l) * B + t];
          if (bits[l] < kRefillThreshold) {
            if (bits[l] < 1) { err = HTPU_E_INVARIANT; return; }
            int32_t idx = nxt[l]++;
            dst[n++] = (idx < W) ? slab[(lane0 + l) * W + idx] : 0;
            bits[l] += 32;
          }
        }
      }
    }
  });
  return err.load();
}

// ---------------------------------------------------------------------------
// Public: interleaved stream decode (CPU twin of the Pallas kernel)
// ---------------------------------------------------------------------------

// stream:   one group's interleaved words (with preload), n_words long
// lj_limit: (32,) uint32 canonical boundaries; base: (33,) uint32 wrapped
// sym_order: (n_unique,) uint16 canonical symbol permutation
// out:      (B, 1024) uint16 row-major — symbol per step per lane
HTPU_API int htpu_interleave_decode(const uint32_t* stream, int64_t n_words,
                                    const uint32_t* lj_limit,
                                    const uint32_t* base,
                                    const uint16_t* sym_order,
                                    int64_t n_unique, int32_t max_len,
                                    int64_t B, int64_t n_real,
                                    uint16_t* out) {
  if (!stream || !lj_limit || !base || !out) return HTPU_E_ARGS;
  if (max_len < 1 || max_len > kMaxCodeLen) return HTPU_E_ARGS;

  std::vector<uint32_t> bufA(kGroupLanes, 0), bufB(kGroupLanes, 0);
  std::vector<int64_t> bits(kGroupLanes);
  for (int l = 0; l < kGroupLanes; ++l) {
    bufA[l] = (l < n_words) ? stream[l] : 0;
    bufB[l] = (kGroupLanes + l < n_words) ? stream[kGroupLanes + l] : 0;
    bits[l] = (l < n_real) ? 64 : (int64_t)1 << 30;
  }
  int64_t head = kPreloadWords * kGroupLanes;

  for (int64_t t = 0; t < B; ++t) {
    uint16_t* row = out + t * kGroupLanes;
    for (int l = 0; l < kGroupLanes; ++l) {
      uint32_t peek = bufA[l];
      int len = 1;
      while (len < max_len && peek >= lj_limit[len - 1]) ++len;
      uint32_t rank = base[len] + (len ? (peek >> (32 - len)) : 0);
      int64_t safe = std::min<int64_t>(rank, std::max<int64_t>(n_unique - 1, 0));
      row[l] = n_unique ? sym_order[safe] : 0;
      if (len == 32) {
        bufA[l] = bufB[l];
        bufB[l] = 0;
      } else {
        bufA[l] = (bufA[l] << len) | (bufB[l] >> (32 - len));
        bufB[l] <<= len;
      }
      bits[l] -= len;
    }
    // Refill pass in lane order (must match the kernel's prefix-rank order).
    for (int l = 0; l < kGroupLanes; ++l) {
      if (bits[l] < kRefillThreshold) {
        uint32_t word = (head < n_words) ? stream[head] : 0;
        ++head;
        int64_t bpos = bits[l];
        if (bpos < 32) {
          bufA[l] |= word >> bpos;
          bufB[l] |= (bpos > 0) ? (word << (32 - bpos)) : 0;
        } else {
          bufB[l] |= word;
        }
        bits[l] += 32;
      }
    }
  }
  return HTPU_OK;
}

// ---------------------------------------------------------------------------
// Public: dense byte-pair histogram (host twin of ops/histogram.py)
// ---------------------------------------------------------------------------

HTPU_API int htpu_histogram(const uint8_t* data, int64_t data_len,
                            int64_t* freqs) {
  if ((!data && data_len) || !freqs) return HTPU_E_ARGS;
  std::memset(freqs, 0, kMaxSymbols * sizeof(int64_t));
  int64_t n_pairs = data_len / 2;
  int nt = num_threads(n_pairs, 1 << 17);
  if (nt <= 1) {
    for (int64_t i = 0; i < n_pairs; ++i)
      freqs[data[2 * i] | (data[2 * i + 1] << 8)]++;
    return HTPU_OK;
  }
  std::vector<std::vector<int64_t>> locals(
      (size_t)nt, std::vector<int64_t>(kMaxSymbols, 0));
  parallel_for(n_pairs, 1 << 17, [&](int64_t a, int64_t b, int tid) {
    int64_t* h = locals[(size_t)tid].data();
    for (int64_t i = a; i < b; ++i)
      h[data[2 * i] | (data[2 * i + 1] << 8)]++;
  });
  parallel_for(kMaxSymbols, 4096, [&](int64_t a, int64_t b, int) {
    for (int64_t s = a; s < b; ++s) {
      int64_t acc = 0;
      for (int t = 0; t < nt; ++t) acc += locals[(size_t)t][(size_t)s];
      freqs[s] = acc;
    }
  });
  return HTPU_OK;
}

// ---------------------------------------------------------------------------
// Public: per-block slab encode (the HTPU container's pack stage)
// ---------------------------------------------------------------------------

// Pass 1: per-block payload bit counts and the per-position length table.
// Symbols at index >= n_pairs are padding (length 0 regardless of value).
HTPU_API int htpu_block_bits(const uint16_t* symbols, int64_t n_pairs,
                             int64_t n_lanes, int64_t B, const uint8_t* lens,
                             int64_t* block_bits, int32_t* lens_out) {
  if (!symbols || !lens || !block_bits || !lens_out) return HTPU_E_ARGS;
  parallel_for(n_lanes, 64, [&](int64_t a, int64_t b, int) {
    for (int64_t l = a; l < b; ++l) {
      int64_t bits = 0;
      for (int64_t t = 0; t < B; ++t) {
        int64_t i = l * B + t;
        int32_t len = (i < n_pairs) ? lens[symbols[i]] : 0;
        lens_out[i] = len;
        bits += len;
      }
      block_bits[l] = bits;
    }
  });
  return HTPU_OK;
}

// Pass 2: pack every block's codewords into its (W-word, MSB-first) slab
// row. Blocks are independent -> parallel over lanes.
HTPU_API int htpu_encode_blocks(const uint16_t* symbols, int64_t n_pairs,
                                int64_t n_lanes, int64_t B,
                                const uint32_t* codes, const uint8_t* lens,
                                int64_t W, uint32_t* slab) {
  if (!symbols || !codes || !lens || !slab) return HTPU_E_ARGS;
  std::memset(slab, 0, (size_t)(n_lanes * W) * 4);
  std::atomic<int> err{HTPU_OK};
  parallel_for(n_lanes, 64, [&](int64_t a, int64_t b, int) {
    for (int64_t l = a; l < b; ++l) {
      uint32_t* row = slab + l * W;
      uint64_t acc = 0;  // staging window, MSB-first
      int filled = 0;    // bits in acc
      int64_t w = 0;
      for (int64_t t = 0; t < B; ++t) {
        int64_t i = l * B + t;
        if (i >= n_pairs) break;
        uint16_t s = symbols[i];
        int len = lens[s];
        if (!len) continue;
        acc = (acc << len) | codes[s];
        filled += len;
        if (filled >= 32) {
          if (w >= W) { err = HTPU_E_OVERFLOW; return; }
          row[w++] = (uint32_t)(acc >> (filled - 32));
          filled -= 32;
          acc &= (filled ? ((1ull << filled) - 1) : 0ull);
        }
      }
      if (filled) {
        if (w >= W) { err = HTPU_E_OVERFLOW; return; }
        row[w] = (uint32_t)(acc << (32 - filled));
      }
    }
  });
  return err.load();
}

// ---------------------------------------------------------------------------
// Row-displacement table packing for the Pallas encode gather
// (ops/pallas_gather.py). First-fit-decreasing over hi-byte rows with a
// bitset collision test; the numpy twin is the reference implementation.
// Returns HTPU_OK and fills disp/table on success, HTPU_E_OVERFLOW when the
// alphabet does not pack into n_slots.
// ---------------------------------------------------------------------------
HTPU_API int htpu_disp_pack(const uint32_t* values,   // 65536 payloads
                            const uint8_t* present,   // 65536 flags
                            int64_t n_slots,          // multiple of 64
                            int32_t* disp,            // 256 out
                            uint32_t* table) {        // n_slots out
  if (!values || !present || !disp || !table || n_slots < 512 ||
      (n_slots & 63))
    return HTPU_E_ARGS;
  const int64_t occ_words = n_slots / 64;
  std::vector<uint64_t> occ((size_t)occ_words + 5, 0);  // +5: window slack
  std::vector<int> order(256);
  std::vector<int> counts(256, 0);
  for (int hi = 0; hi < 256; ++hi) {
    int c = 0;
    for (int lo = 0; lo < 256; ++lo) c += present[hi * 256 + lo] ? 1 : 0;
    counts[hi] = c;
    order[hi] = hi;
  }
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    return counts[a] != counts[b] ? counts[a] > counts[b] : a < b;
  });
  std::memset(table, 0, (size_t)n_slots * 4);
  std::memset(disp, 0, 256 * 4);
  const int64_t max_d = n_slots - 256;
  for (int oi = 0; oi < 256; ++oi) {
    int hi = order[oi];
    if (!counts[hi]) continue;
    uint64_t pat[4] = {0, 0, 0, 0};
    int anchor = -1;
    for (int lo = 0; lo < 256; ++lo)
      if (present[hi * 256 + lo]) {
        pat[lo >> 6] |= 1ull << (lo & 63);
        if (anchor < 0) anchor = lo;
      }
    int64_t found = -1;
    for (int64_t d = 0; d <= max_d && found < 0; ++d) {
      // cheap anchor pre-test, then the full 4-word window AND
      int64_t ab = d + anchor;
      if (occ[ab >> 6] & (1ull << (ab & 63))) continue;
      int64_t q = d >> 6, r = d & 63;
      bool hit = false;
      for (int i = 0; i < 4 && !hit; ++i) {
        uint64_t w = r ? ((occ[q + i] >> r) | (occ[q + i + 1] << (64 - r)))
                       : occ[q + i];
        hit = (w & pat[i]) != 0;
      }
      if (!hit) found = d;
    }
    if (found < 0) return HTPU_E_OVERFLOW;
    disp[hi] = (int32_t)found;
    for (int lo = 0; lo < 256; ++lo)
      if (present[hi * 256 + lo]) {
        int64_t s = found + lo;
        occ[s >> 6] |= 1ull << (s & 63);
        table[s] = values[hi * 256 + lo];
      }
  }
  return HTPU_OK;
}
