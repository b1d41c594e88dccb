// Native runtime components for mash-tpu.
//
// TPU kernels handle the heavy hashing/selection math; these host-side
// pieces cover the parts that are inherently sequential or I/O-bound:
//
//  1. An exact streaming bottom-s MinHash selector with the reference's
//     stream-order semantics (min-copy pending gate, Bloom-filtered
//     unique-k-mer suppression, eviction-time pending purge) — used for
//     bit-parity of -m/-b/-M modes, fed with device-computed hashes in
//     stream order (semantics follow src/mash/MinHashHeap.cpp:68-146 of
//     the reference; implementation is original).
//
//  2. A FASTA/FASTQ record parser over a decompressed buffer, producing a
//     packed sequence byte stream ready for device chunking.
//
// Built as a plain C-ABI shared library; bound from Python with ctypes.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <cmath>
#include <string>
#include <queue>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <map>
#include <deque>
#if defined(__x86_64__)
#include <immintrin.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Bit-compatible -b Bloom filter.
//
// The reference feeds Arash Partow's "Open Bloom Filter" the degenerate
// parameters projected=1e9, fpp=0, maximum_size=memoryBound*8
// (src/mash/MinHashHeap.cpp:25-41).  With fpp=0 the optimizer's
// table-size formula evaluates to -inf for every k
// (bloom_filter.hpp:107-156: log(1-0^(1/k)) == 0), so min_k stays 1 and
// the (unsigned long long)(-inf) cast yields 2^63 on x86 (cvttsd2si
// out-of-range), which the max clamp brings down to memoryBound*8.
// Net effect: ONE hash function over a memoryBound*8-bit table.  The
// single salt is predef_salt[0] mixed with itself and the fixed seed
// (bloom_filter.hpp:494-509: salt*salt + (uint32)((0xA5A5A5A55A5A5A5A *
// 0xA5A5A5A5) + 1)), and the probe is Partow's hash_ap over the 8 (or
// 4) little-endian key bytes with bit = (hash % table_size), bit
// position index%8 within byte index/8 (compute_indices,
// hpp:441-445).  All reimplemented here from that analysis — byte
// layout identical, so -b sketches byte-match the reference.
// ---------------------------------------------------------------------------

struct Bloom {
    std::vector<uint8_t> bits;
    uint64_t table_size;
    uint32_t salt;
    bool use64;

    explicit Bloom(uint64_t max_bytes, bool use64_) : use64(use64_) {
        table_size = max_bytes * 8ull;
        if (table_size < 1) table_size = 1;
        bits.assign((table_size + 7) / 8, 0);
        uint64_t seed = 0xA5A5A5A55A5A5A5Aull * 0xA5A5A5A5ull + 1ull;
        uint32_t s0 = 0xAAAAAAAAu;
        salt = s0 * s0 + (uint32_t)seed;
    }

    inline uint32_t hash_ap(uint64_t key) const {
        uint32_t h = salt;
        if (use64) {
            // one >=8-byte loop iteration: i1 = low word, i2 = high
            uint32_t i1 = (uint32_t)key;
            uint32_t i2 = (uint32_t)(key >> 32);
            h ^= (h << 7) ^ (i1 * (h >> 3)) ^
                 (~((h << 11) + (i2 ^ (h >> 5))));
        } else {
            // 4-byte tail, loop parity 0
            uint32_t i = (uint32_t)key;
            h ^= ~((h << 11) + (i ^ (h >> 5)));
        }
        return h;
    }

    bool contains_or_insert(uint64_t h, bool insert_if_absent) {
        uint64_t bit_index = hash_ap(h) % table_size;
        uint64_t byte = bit_index / 8;
        uint8_t mask = (uint8_t)(1u << (bit_index % 8));
        if (bits[byte] & mask) return true;
        if (insert_if_absent) bits[byte] |= mask;
        return false;
    }
};

// ---------------------------------------------------------------------------
// Exact streaming bottom-s selector.
// ---------------------------------------------------------------------------

struct ExactHeap {
    uint64_t cap;            // sketch size s
    uint32_t min_cov;        // -m
    uint64_t multiplicity_sum;
    std::unordered_map<uint64_t, uint32_t> counts;   // hashes in the heap
    std::priority_queue<uint64_t> q;                 // max-heap over them
    std::unordered_map<uint64_t, uint32_t> pending;  // below min-copy
    std::priority_queue<uint64_t> pending_q;
    Bloom* bloom;
    uint64_t kmers_total, kmers_used;

    ExactHeap(uint64_t cap_, uint32_t min_cov_, uint64_t bloom_bytes,
              bool use64)
        : cap(cap_), min_cov(min_cov_), multiplicity_sum(0),
          bloom(bloom_bytes ? new Bloom(bloom_bytes, use64) : nullptr),
          kmers_total(0), kmers_used(0) {
        counts.reserve(cap_ * 2);
    }
    ~ExactHeap() { delete bloom; }

    inline void try_insert(uint64_t h) {
        if (!(counts.size() < cap || h < q.top())) return;

        auto it = counts.find(h);
        if (it == counts.end()) {
            if (bloom) {
                if (bloom->contains_or_insert(h, false)) {
                    counts.emplace(h, 2);
                    q.push(h);
                    multiplicity_sum += 2;
                    kmers_used++;
                } else {
                    bloom->contains_or_insert(h, true);
                    kmers_total++;
                    return;  // not in heap; no eviction can trigger
                }
            } else if (min_cov == 1) {
                counts.emplace(h, 1);
                q.push(h);
                multiplicity_sum += 1;
            } else {
                auto p = pending.find(h);
                uint32_t seen = (p == pending.end()) ? 0 : p->second;
                if (seen == min_cov - 1) {
                    counts.emplace(h, min_cov);
                    q.push(h);
                    multiplicity_sum += min_cov;
                    pending.erase(p);
                } else {
                    if (p == pending.end()) {
                        pending.emplace(h, 1);
                        pending_q.push(h);
                    } else {
                        p->second += 1;
                    }
                    return;  // heap unchanged; no eviction
                }
            }
        } else {
            it->second += 1;
            multiplicity_sum += 1;
        }

        if (counts.size() > cap) {
            uint64_t top = q.top();
            multiplicity_sum -= counts[top];
            counts.erase(top);
            // purge pending entries beyond the (old) top; stale queue
            // entries whose map entry is gone are popped too
            while (!pending_q.empty() && top < pending_q.top()) {
                pending.erase(pending_q.top());
                pending_q.pop();
            }
            q.pop();
        }
    }
};

void* mash_heap_create(uint64_t cap, uint32_t min_cov,
                       uint64_t bloom_bytes, int use64) {
    // cap == 0 would read q.top() on an empty priority queue in
    // try_insert (UB); the CLI never requests it (sketch size >= 1)
    if (cap == 0) return nullptr;
    return new ExactHeap(cap, min_cov, bloom_bytes, use64 != 0);
}

// Bare Bloom hooks for differential tests against the Partow oracle.
void* mash_bloom_create(uint64_t max_bytes, int use64) {
    return new Bloom(max_bytes, use64 != 0);
}
void mash_bloom_destroy(void* b) { delete (Bloom*)b; }
int mash_bloom_contains(void* b, uint64_t h) {
    return ((Bloom*)b)->contains_or_insert(h, false) ? 1 : 0;
}
void mash_bloom_insert(void* b, uint64_t h) {
    ((Bloom*)b)->contains_or_insert(h, true);
}

void mash_heap_destroy(void* h) { delete (ExactHeap*)h; }

void mash_heap_insert(void* hp, const uint64_t* hashes, int64_t n) {
    ExactHeap* h = (ExactHeap*)hp;
    for (int64_t i = 0; i < n; i++) h->try_insert(hashes[i]);
}

int64_t mash_heap_size(void* hp) {
    return (int64_t)((ExactHeap*)hp)->counts.size();
}

uint64_t mash_heap_top(void* hp) {
    ExactHeap* h = (ExactHeap*)hp;
    if (h->counts.empty()) return ~0ull;
    return h->q.top();
}

int mash_heap_full(void* hp) {
    ExactHeap* h = (ExactHeap*)hp;
    return h->counts.size() >= h->cap ? 1 : 0;
}

double mash_heap_multiplicity(void* hp) {
    ExactHeap* h = (ExactHeap*)hp;
    if (h->counts.empty()) return 0.0;
    return (double)h->multiplicity_sum / (double)h->counts.size();
}

double mash_heap_set_size(void* hp, int use64) {
    ExactHeap* h = (ExactHeap*)hp;
    if (h->counts.empty()) return 0.0;
    double space = use64 ? std::pow(2.0, 64.0) : std::pow(2.0, 32.0);
    return space * (double)h->counts.size() / (double)h->q.top();
}

// Extract sorted (hash, count) pairs; returns count written.
int64_t mash_heap_extract(void* hp, uint64_t* out_h, uint32_t* out_c,
                          int64_t out_cap) {
    ExactHeap* h = (ExactHeap*)hp;
    std::vector<std::pair<uint64_t, uint32_t>> items(
        h->counts.begin(), h->counts.end());
    std::sort(items.begin(), items.end());
    int64_t n = (int64_t)items.size();
    if (n > out_cap) n = out_cap;
    for (int64_t i = 0; i < n; i++) {
        out_h[i] = items[i].first;
        out_c[i] = items[i].second;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Fast "%.6g" Mash-distance text formatting for streamed triangle/dist
// tiles.  A 100k-genome PHYLIP matrix is ~5e9 cells; per-cell printf on
// the Python side would dominate wall-clock.  Cells arrive packed as
// (common | denom << 16) uint32; the distance formula replicates the
// reference exactly (src/mash/CommandDistance.cpp:387-407).  Because
// denom is almost always the sketch-size cap, distinct (common, denom)
// pairs are few — formatted strings are memoized (direct table for
// cap <= 1024, hash map above).
// ---------------------------------------------------------------------------

struct DistFormatter {
    int64_t k;
    int64_t cap;
    std::vector<uint8_t> table_len;   // direct memo (cap <= 1024)
    std::vector<char> table_str;      // 16 bytes per entry
    std::unordered_map<uint32_t, std::string> memo;  // fallback
    bool direct;

    DistFormatter(int64_t k_, int64_t cap_) : k(k_), cap(cap_) {
        direct = cap <= 1024;
        if (direct) {
            int64_t n = (cap + 1) * (cap + 1);
            table_len.assign(n, 0xFF);  // 0xFF = not yet formatted
            table_str.resize(n * 16);
        }
    }

    inline double dist(uint32_t c, uint32_t d) const {
        // check order matches the reference (CommandDistance.cpp:
        // 389-397): common == denom FIRST, so 0/0 -> distance 0
        if (c == d) return 0.0;
        if (c == 0) return 1.0;
        double j = (double)c / (double)d;
        double x = -log(2.0 * j / (1.0 + j)) / (double)k;
        return x > 1.0 ? 1.0 : x;
    }

    // formatted cell -> (ptr, len); storage owned by the formatter
    inline const char* cell(uint32_t packed, int* len) {
        uint32_t c = packed & 0xFFFFu, d = packed >> 16;
        if (direct && c <= (uint32_t)cap && d <= (uint32_t)cap) {
            int64_t idx = (int64_t)d * (cap + 1) + c;
            if (table_len[idx] == 0xFF) {
                char buf[32];
                int n = snprintf(buf, sizeof buf, "%.6g", dist(c, d));
                if (n > 15) n = 15;
                memcpy(&table_str[idx * 16], buf, n);
                table_len[idx] = (uint8_t)n;
            }
            *len = table_len[idx];
            return &table_str[idx * 16];
        }
        auto it = memo.find(packed);
        if (it == memo.end()) {
            char buf[32];
            snprintf(buf, sizeof buf, "%.6g", dist(c, d));
            it = memo.emplace(packed, buf).first;
        }
        *len = (int)it->second.size();
        return it->second.data();
    }
};

void* mash_fmt_create(int64_t k, int64_t cap) {
    return new DistFormatter(k, cap);
}
void mash_fmt_destroy(void* f) { delete (DistFormatter*)f; }

// Emit "\t%.6g" per packed cell (PHYLIP row body).  Returns bytes
// written, or -1 if out_cap is too small (caller sizes 16*n + 16).
int64_t mash_fmt_phylip_cells(void* fv, const uint32_t* packed,
                              int64_t n, char* out, int64_t out_cap) {
    DistFormatter& f = *(DistFormatter*)fv;
    int64_t w = 0;
    for (int64_t i = 0; i < n; i++) {
        int len;
        const char* s = f.cell(packed[i], &len);
        if (w + len + 1 > out_cap) return -1;
        out[w++] = '\t';
        memcpy(out + w, s, len);
        w += len;
    }
    return w;
}

// ---------------------------------------------------------------------------
// Streaming FASTA/FASTQ ingest: incremental parse + chunk-row packing.
//
// The TPU sketch pipeline consumes fixed-shape [chunk_len] uint8 rows in
// which records are separated by 0x00 bytes and consecutive rows overlap
// by k-1 bytes (so no k-mer window is lost at a row boundary) — the same
// layout mash_tpu.core.engine.chunk_stream produces.  This ingest object
// builds those rows directly from raw file blocks in one pass, carrying
// parser state across arbitrary block boundaries, so the Python side
// never touches per-record data.  It is the TPU-native equivalent of the
// reference's reader+worker streaming (src/mash/Sketch.cpp:1147-1336,
// src/mash/CommandScreen.cpp:155-270 round-robin chunk packing).
//
// Records shorter than k are packed too (they contribute no valid k-mer
// window: every window inside them is shorter than k and separators
// flank them) but excluded from the record metadata, matching the
// reference's skip semantics (Sketch.cpp:1206-1210).
// ---------------------------------------------------------------------------

struct Ingest {
    int64_t chunk_len;
    int64_t k;
    // pack_mode: 0 = raw byte rows; 1/2 = ACGT 2-bit codes + validity
    // bitmask (1 folds case on host, 2 preserves case).  Packed rows are
    // chunk_len/4 code bytes then chunk_len/8 mask bytes — 0.375
    // bytes/base, a 2.67x host->device transfer reduction.  Exact byte
    // reconstruction of *valid* characters is preserved; invalid
    // positions only need to stay invalid (they never reach the hash),
    // so the mask alone carries them.
    int64_t pack_mode;
    int64_t row_bytes;

    enum State { MARKER, HEADER, FASTA_SEQ, FASTQ_SEQ, FASTQ_PLUS,
                 FASTQ_QUAL };
    State st = MARKER;
    bool line_start = true;
    bool emitted_any = false;    // any record content packed yet

    // current record
    int64_t rec_len = 0;         // sequence bytes so far
    int64_t qual_count = 0;
    int64_t rec_ordinal = -1;    // index of current record in this stream
    std::vector<uint8_t> header; // captured only until first valid record

    // chunk packing
    std::vector<uint8_t> chunk;  // fill buffer, capacity chunk_len
    // per-feed output (set by feed/finish): rows fill rows_out first,
    // then overflow into the spill area (copied by the caller into the
    // next batch), so a feed never has to stop mid-parse
    uint8_t* rows_out = nullptr;
    int64_t rows_cap = 0, rows_n = 0;
    uint8_t* spill_out = nullptr;
    int64_t spill_cap = 0, spill_n = 0;
    bool overflow = false;

    // metadata
    int64_t count = 0;           // records with len >= k
    int64_t total_len = 0;       // sum of their lengths
    bool skipped = false;        // any record with len < k seen
    int64_t first_valid_ordinal = -1;
    std::vector<uint8_t> first_header;

    Ingest(int64_t cl, int64_t k_, int64_t pm)
        : chunk_len(cl), k(k_), pack_mode(pm),
          row_bytes(pm ? cl / 4 + cl / 8 : cl) {
        chunk.reserve(cl);
    }

    // Exact SWAR zero-byte finder (Hacker's Delight): 0x80 set in each
    // byte position where x's byte is 0; no cross-byte borrow artifacts.
    static inline uint64_t zbytes(uint64_t x) {
        uint64_t y = (x & 0x7F7F7F7F7F7F7F7Full) + 0x7F7F7F7F7F7F7F7Full;
        return ~(y | x | 0x7F7F7F7F7F7F7F7Full);
    }
    static inline uint64_t eqb(uint64_t w, uint8_t ch) {
        return zbytes(w ^ (0x0101010101010101ull * ch));
    }
    // 0x80 set where byte < n (valid for n <= 128)
    static inline uint64_t ltb(uint64_t x, uint8_t n) {
        return (x - 0x0101010101010101ull * n) & ~x &
               0x8080808080808080ull;
    }
    // 0x80 set where byte is NOT printable-non-space (outside [33,126])
    static inline uint64_t nonprint(uint64_t w) {
        return ltb(w, 33) | (w & 0x8080808080808080ull) |
               zbytes(w ^ 0x7F7F7F7F7F7F7F7Full);
    }

#if defined(__x86_64__)
    // AVX2 pack: 32 input bytes -> 8 code bytes + 4 mask bytes per
    // iteration (movemask gives the validity bits directly; the
    // maddubs/madd ladder packs 2-bit codes 4-per-byte in the same
    // little-endian order as the scalar path below).
    __attribute__((target("avx2")))
    void pack_row_avx2(const uint8_t* src, uint8_t* dst) const {
        const bool fold = pack_mode == 1;
        uint8_t* pk = dst;
        uint8_t* mk = dst + chunk_len / 4;
        const __m256i case_bit = _mm256_set1_epi8(0x20);
        const __m256i cA = _mm256_set1_epi8('A');
        const __m256i cC = _mm256_set1_epi8('C');
        const __m256i cG = _mm256_set1_epi8('G');
        const __m256i cT = _mm256_set1_epi8('T');
        const __m256i lo3 = _mm256_set1_epi8(0x03);
        const __m256i w14 = _mm256_set1_epi16(0x0401);   // weights 1,4
        const __m256i w116 = _mm256_set1_epi32(0x00100001);  // 1,16
        const __m256i pick = _mm256_setr_epi8(
            0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
            -1, 0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
            -1, -1);
        for (int64_t g = 0; g < chunk_len / 32; g++) {
            __m256i w = _mm256_loadu_si256(
                (const __m256i*)(src + g * 32));
            __m256i wf = fold ? _mm256_andnot_si256(case_bit, w) : w;
            __m256i valid = _mm256_or_si256(
                _mm256_or_si256(_mm256_cmpeq_epi8(wf, cA),
                                _mm256_cmpeq_epi8(wf, cC)),
                _mm256_or_si256(_mm256_cmpeq_epi8(wf, cG),
                                _mm256_cmpeq_epi8(wf, cT)));
            uint32_t m = (uint32_t)_mm256_movemask_epi8(valid);
            memcpy(mk + g * 4, &m, 4);
            // (c>>1)&3 per byte (srli_epi16 shifts bit 8 into bit 7 of
            // each byte, but &3 keeps only bits 0-1, so it's safe)
            __m256i x = _mm256_and_si256(_mm256_srli_epi16(wf, 1), lo3);
            __m256i s16 = _mm256_maddubs_epi16(x, w14);
            __m256i s32 = _mm256_madd_epi16(s16, w116);
            __m256i b = _mm256_shuffle_epi8(s32, pick);
            uint32_t lo = (uint32_t)_mm256_extract_epi32(b, 0);
            uint32_t hi = (uint32_t)_mm256_extract_epi32(b, 4);
            memcpy(pk + g * 8, &lo, 4);
            memcpy(pk + g * 8 + 4, &hi, 4);
        }
    }
#endif

    inline void pack_row(const uint8_t* src, uint8_t* dst) const {
#if defined(__x86_64__)
        // MASH_INGEST_NO_AVX2 forces the scalar path so CI on AVX2
        // hosts can cross-check both implementations end-to-end
        static const bool has_avx2 =
            __builtin_cpu_supports("avx2") &&
            !getenv("MASH_INGEST_NO_AVX2");
        if (has_avx2 && chunk_len % 32 == 0) {
            pack_row_avx2(src, dst);
            return;
        }
#endif
        // 8 input bytes -> 2 code bytes + 1 mask byte, u64 at a time
        const bool fold = pack_mode == 1;
        uint8_t* pk = dst;
        uint8_t* mk = dst + chunk_len / 4;
        for (int64_t g = 0; g < chunk_len / 8; g++) {
            uint64_t w;
            memcpy(&w, src + g * 8, 8);
            uint64_t v = eqb(w, 'A') | eqb(w, 'C') | eqb(w, 'G') |
                         eqb(w, 'T');
            uint64_t wf = w;
            if (fold) {
                v |= eqb(w, 'a') | eqb(w, 'c') | eqb(w, 'g') |
                     eqb(w, 't');
                wf &= ~0x2020202020202020ull;  // fold case; non-letters
                                               // get mangled but are
                                               // invalid anyway
            }
            // (c>>1)&3 maps A->0 C->1 T->2 G->3 (classic 2-bit code)
            uint64_t x = (wf >> 1) & 0x0303030303030303ull;
            pk[g * 2] = (uint8_t)((x | x >> 6 | x >> 12 | x >> 18) &
                                  0xFF);
            pk[g * 2 + 1] =
                (uint8_t)((x >> 32 | x >> 38 | x >> 44 | x >> 50) &
                          0xFF);
            mk[g] = (uint8_t)((v >> 7 & 1) | (v >> 14 & 2) |
                              (v >> 21 & 4) | (v >> 28 & 8) |
                              (v >> 35 & 16) | (v >> 42 & 32) |
                              (v >> 49 & 64) | (v >> 56 & 128));
        }
    }

    inline void write_row(uint8_t* dst) const {
        if (pack_mode) pack_row(chunk.data(), dst);
        else memcpy(dst, chunk.data(), chunk_len);
    }

    inline void flush_row() {
        if (rows_n < rows_cap) {
            write_row(rows_out + rows_n * row_bytes);
            rows_n++;
        } else if (spill_n < spill_cap) {
            write_row(spill_out + spill_n * row_bytes);
            spill_n++;
        } else {
            overflow = true;
            return;
        }
        // keep the k-1 byte overlap as the next row's prefix
        uint8_t tail[64];
        memcpy(tail, chunk.data() + (chunk_len - (k - 1)), k - 1);
        chunk.assign(tail, tail + (k - 1));
    }

    inline void emit_byte(uint8_t c) {
        chunk.push_back(c);
        if ((int64_t)chunk.size() == chunk_len) flush_row();
    }

    inline void emit_span(const uint8_t* p, int64_t n) {
        while (n > 0 && !overflow) {
            int64_t space = chunk_len - (int64_t)chunk.size();
            int64_t m = n < space ? n : space;
            chunk.insert(chunk.end(), p, p + m);
            p += m; n -= m;
            if ((int64_t)chunk.size() == chunk_len) flush_row();
        }
    }

    inline void end_record() {
        if (rec_len >= k) {
            if (first_valid_ordinal < 0) {
                first_valid_ordinal = rec_ordinal;
                first_header = header;
            }
            count++;
            total_len += rec_len;
        } else {
            skipped = true;
        }
        header.clear();
    }

    inline void begin_record(bool fastq) {
        rec_ordinal++;
        rec_len = 0;
        qual_count = 0;
        header.clear();
        st = HEADER;
        fastq_rec = fastq;
    }
    bool fastq_rec = false;

    // Emit sequence content bytes with kseq's byte filter: only
    // printable non-space characters (isgraph: 33..126) are part of a
    // sequence (src/mash/kseq.h:184-190); newlines, CR, spaces, tabs
    // and control bytes are dropped wherever they appear.  Returns
    // bytes consumed; stops (without consuming) at any of kseq's THREE
    // sequence terminators '>'/'+'/'@' (kseq.h:183) at a line start,
    // regardless of this record's own format — a truncated FASTQ
    // record missing its '+' line must not swallow the next '@' record
    // into its sequence.  (kseq checks the terminators ANYWHERE; real
    // sequences never contain them, and line-start detection matches
    // the Python parser.)
    inline int64_t consume_seq(const uint8_t* data, int64_t n) {
        int64_t i = 0;
        while (i < n) {
            uint8_t c = data[i];
            if (line_start && (c == '>' || c == '@' || c == '+')) {
                return i;
            }
            if (c >= 33 && c <= 126) {
                int64_t j = i + 1;
                // SWAR: swallow 8 printable bytes per step (sequence
                // lines are long printable runs; per-byte scans dominate
                // the parse otherwise)
                while (j + 8 <= n) {
                    uint64_t w;
                    memcpy(&w, data + j, 8);
                    uint64_t bad = nonprint(w);
                    if (bad) {
                        j += __builtin_ctzll(bad) >> 3;
                        break;
                    }
                    j += 8;
                }
                while (j < n && data[j] >= 33 && data[j] <= 126) j++;
                emit_span(data + i, j - i);
                rec_len += j - i;
                line_start = false;
                i = j;
            } else {
                line_start = (c == '\n');
                i++;
            }
        }
        return n;
    }
};

void* mash_ingest_create(int64_t chunk_len, int64_t k,
                         int64_t pack_mode) {
    if (pack_mode && chunk_len % 8) return nullptr;
    // flush_row keeps the k-1-byte overlap in a fixed 64-byte buffer;
    // reject k outside what it (and Mash's k<=32 CLI bound) can hold.
    if (k < 1 || k > 64) return nullptr;
    return new Ingest(chunk_len, k, pack_mode);
}

void mash_ingest_destroy(void* p) { delete (Ingest*)p; }

// Feed one block.  Completed rows go to rows_out (the caller's batch
// buffer) until rows_cap, then to spill_out; rows_cap + spill_cap must
// cover (n + chunk_len) / (chunk_len - k + 1) + 2 rows.  Returns rows
// written to rows_out (query spill via mash_ingest_spill_n), or -1 on
// combined overflow.
int64_t mash_ingest_feed(void* pv, const uint8_t* data, int64_t n,
                         uint8_t* rows_out, int64_t rows_cap,
                         uint8_t* spill_out, int64_t spill_cap) {
    Ingest& g = *(Ingest*)pv;
    g.rows_out = rows_out;
    g.rows_cap = rows_cap;
    g.rows_n = 0;
    g.spill_out = spill_out;
    g.spill_cap = spill_cap;
    g.spill_n = 0;
    g.overflow = false;

    int64_t i = 0;
    while (i < n && !g.overflow) {
        switch (g.st) {
        case Ingest::MARKER: {
            // scan for '>' or '@' at a line start (memchr jumps line
            // to line instead of walking every byte)
            while (i < n) {
                if (g.line_start) {
                    uint8_t c = data[i];
                    if (c == '>' || c == '@') break;
                    g.line_start = (c == '\n');
                    i++;
                } else {
                    const uint8_t* nl = (const uint8_t*)memchr(
                        data + i, '\n', n - i);
                    if (!nl) { i = n; break; }
                    i = (nl - data) + 1;
                    g.line_start = true;
                }
            }
            if (i < n) {
                // previous records were already closed by their own end
                // states (FASTA_SEQ marker hit / FASTQ_QUAL completion)
                g.begin_record(data[i] == '@');
                i++;  // past marker
                g.line_start = false;
            }
            break;
        }
        case Ingest::HEADER: {
            const uint8_t* nl =
                (const uint8_t*)memchr(data + i, '\n', n - i);
            int64_t he = nl ? (nl - data) : n;
            // Captured once per stream (first valid record only), so
            // growing unboundedly is cheap and keeps the fast path's
            // name/comment byte-identical to the Python record path
            // (kseq keeps full headers; Mash Sketch.cpp:1046-1076 uses
            // them verbatim for name/comment).
            if (g.first_valid_ordinal < 0) {
                g.header.insert(g.header.end(), data + i, data + he);
            }
            if (nl) {
                if (!g.header.empty() && g.header.back() == '\r')
                    g.header.pop_back();
                i = he + 1;
                g.line_start = true;
                // separator before this record's content (not for the
                // very first packed record)
                if (g.emitted_any) g.emit_byte(0);
                g.emitted_any = true;
                g.st = g.fastq_rec ? Ingest::FASTQ_SEQ
                                   : Ingest::FASTA_SEQ;
            } else {
                i = n;
            }
            break;
        }
        case Ingest::FASTA_SEQ:
        case Ingest::FASTQ_SEQ: {
            // one kseq-faithful path for both formats: '+' leads to a
            // quality section sized by the sequence; '>'/'@' ends the
            // record (a FASTQ record whose '+' line is missing)
            int64_t used = g.consume_seq(data + i, n - i);
            i += used;
            if (i < n) {
                if (data[i] == '+') {
                    g.st = Ingest::FASTQ_PLUS;
                } else {
                    g.end_record();
                    g.st = Ingest::MARKER;
                }
            }
            break;
        }
        case Ingest::FASTQ_PLUS: {
            const uint8_t* nl =
                (const uint8_t*)memchr(data + i, '\n', n - i);
            if (nl) {
                i = (nl - data) + 1;
                g.line_start = true;
                g.st = Ingest::FASTQ_QUAL;
            } else {
                i = n;
            }
            break;
        }
        case Ingest::FASTQ_QUAL: {
            // count quality bytes in [33,127] (kseq.h:206-207) until
            // they cover the (filtered) sequence length; SWAR swallows
            // 8 counted bytes per step on all-printable runs
            while (i < n && g.qual_count < g.rec_len) {
                if (g.rec_len - g.qual_count >= 8 && i + 8 <= n) {
                    uint64_t w;
                    memcpy(&w, data + i, 8);
                    // qual accepts [33,127]: bad = <33 or >=128
                    if (!(Ingest::ltb(w, 33) |
                          (w & 0x8080808080808080ull))) {
                        g.qual_count += 8;
                        g.line_start = false;
                        i += 8;
                        continue;
                    }
                }
                uint8_t c = data[i];
                if (c >= 33 && c <= 127) g.qual_count++;
                g.line_start = (c == '\n');
                i++;
            }
            if (g.qual_count >= g.rec_len) {
                g.end_record();
                g.st = Ingest::MARKER;
            }
            break;
        }
        }
    }
    if (g.overflow) return -1;
    return g.rows_n;
}

// End of stream: close any open record and flush the final partial row
// (zero-padded).  Returns rows written (0 or 1), or -1 on overflow.
int64_t mash_ingest_finish(void* pv, uint8_t* rows_out,
                           int64_t rows_cap) {
    Ingest& g = *(Ingest*)pv;
    g.rows_out = rows_out;
    g.rows_cap = rows_cap;
    g.rows_n = 0;
    g.spill_out = nullptr;
    g.spill_cap = 0;
    g.spill_n = 0;
    g.overflow = false;
    if (g.st != Ingest::MARKER && g.rec_ordinal >= 0) {
        g.end_record();
        g.st = Ingest::MARKER;
    }
    if ((int64_t)g.chunk.size() >= g.k) {
        g.chunk.resize(g.chunk_len, 0);
        g.flush_row();
        g.chunk.clear();
    }
    if (g.overflow) return -1;
    return g.rows_n;
}

int64_t mash_ingest_spill_n(void* pv) {
    return ((Ingest*)pv)->spill_n;
}

int64_t mash_ingest_count(void* pv) { return ((Ingest*)pv)->count; }
int64_t mash_ingest_total_len(void* pv) {
    return ((Ingest*)pv)->total_len;
}
int mash_ingest_skipped(void* pv) {
    return ((Ingest*)pv)->skipped ? 1 : 0;
}
int64_t mash_ingest_first_ordinal(void* pv) {
    return ((Ingest*)pv)->first_valid_ordinal;
}
int64_t mash_ingest_first_header(void* pv, uint8_t* out, int64_t cap) {
    Ingest& g = *(Ingest*)pv;
    int64_t m = (int64_t)g.first_header.size();
    if (m > cap) m = cap;
    memcpy(out, g.first_header.data(), m);
    return (int64_t)g.first_header.size();
}

// ---------------------------------------------------------------------------
// Windowed minmer sweep.
//
// Finds positions whose hash is a bottom-h *distinct* min-hash of some
// length-W window of the hash sequence, with repeat handling: only the
// left-most in-window occurrence of a repeated hash is a candidate at any
// time.  Stream-order semantics follow the reference's rolling-window
// algorithm (src/mash/Sketch.cpp:585-895); implementation is original.
// Hashes are precomputed (on device) by the caller; every position
// participates (the reference's invalid-k-mer skip is disabled there too).
// ---------------------------------------------------------------------------

int64_t mash_minmers(const uint64_t* hashes, int64_t n, int64_t window,
                     int64_t mins, uint32_t* out_pos, uint64_t* out_hash,
                     int64_t out_cap) {
    if (n <= 0) return 0;
    if (window > n) window = n;

    struct Cand {
        uint32_t pos;
        bool minmer;
    };
    typedef std::map<uint64_t, std::deque<Cand>> CMap;
    CMap cands;
    std::deque<CMap::iterator> window_q;
    CMap::iterator boundary = cands.end();  // h-th smallest key, or end()
    int64_t out_n = 0;

    auto emit = [&](uint32_t pos, uint64_t h) -> bool {
        if (out_n >= out_cap) return false;
        out_pos[out_n] = pos;
        out_hash[out_n] = h;
        out_n++;
        return true;
    };

    for (int64_t i = 0; i < n; i++) {
        uint64_t h = hashes[i];
        auto ins = cands.emplace(h, std::deque<Cand>());
        CMap::iterator cur = ins.first;
        cur->second.push_back(Cand{(uint32_t)i, false});
        if (ins.second &&
            ((boundary == cands.end() && (int64_t)cands.size() == mins) ||
             (boundary != cands.end() && h < boundary->first))) {
            --boundary;
        }

        window_q.push_back(cur);
        CMap::iterator front = cands.end();
        if ((int64_t)window_q.size() > window) {
            front = window_q.front();
            window_q.pop_front();
        }

        bool cur_erased = false;
        if (front != cands.end()) {
            std::deque<Cand>& fc = front->second;
            if (fc.front().minmer) {
                if (!emit(fc.front().pos, front->first)) return -1;
            }
            if (fc.size() > 1) {
                fc.pop_front();
                if (boundary == cands.end() ||
                    (i >= window && front->first <= boundary->first)) {
                    fc.front().minmer = true;
                }
            } else {
                if (boundary != cands.end() &&
                    front->first <= boundary->first) {
                    ++boundary;
                    if (boundary != cands.end()) {
                        boundary->second.front().minmer = true;
                    }
                }
                if (front == cur) cur_erased = true;  // window == 1 edge
                cands.erase(front);
            }
        }

        if (i == window - 1) {
            for (CMap::iterator j = cands.begin(); j != boundary; ++j) {
                j->second.front().minmer = true;
            }
            if (boundary != cands.end()) {
                boundary->second.front().minmer = true;
            }
        }

        if (!cur_erased && i >= window &&
            (boundary == cands.end() || cur->first <= boundary->first)) {
            cur->second.front().minmer = true;
        }
    }

    // drain the final window
    while (!window_q.empty()) {
        CMap::iterator front = window_q.front();
        window_q.pop_front();
        std::deque<Cand>& fc = front->second;
        if (!fc.empty()) {
            if (fc.front().minmer) {
                if (!emit(fc.front().pos, front->first)) return -1;
            }
            fc.pop_front();
        }
    }
    return out_n;
}

}  // extern "C"
