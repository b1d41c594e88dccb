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
#include <cmath>
#include <queue>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <map>
#include <deque>

extern "C" {

// ---------------------------------------------------------------------------
// Simple Bloom filter (double hashing over splitmix64).
// Matches the reference's *semantics* for -b mode (bounded memory, unique
// k-mers suppressed, copies capped at 2); the bit layout is not identical
// to the vendored filter the reference uses, so -b sketches are
// approximate-equal, as that mode inherently is.
// ---------------------------------------------------------------------------

struct Bloom {
    std::vector<uint64_t> bits;
    uint64_t nbits;
    int k;

    explicit Bloom(uint64_t max_bytes) {
        nbits = max_bytes * 8ull;
        if (nbits < 64) nbits = 64;
        bits.assign((nbits + 63) / 64, 0);
        // optimal k for ~1e9 projected elements, clamped to [1, 16]
        double kk = (double)nbits / 1e9 * 0.6931471805599453;
        k = (int)(kk + 0.5);
        if (k < 1) k = 1;
        if (k > 16) k = 16;
    }

    static inline uint64_t mix(uint64_t x) {
        x += 0x9e3779b97f4a7c15ull;
        x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
        x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
        return x ^ (x >> 31);
    }

    bool contains_or_insert(uint64_t h, bool insert_if_absent) {
        uint64_t h1 = mix(h);
        uint64_t h2 = mix(h1 ^ 0xd6e8feb86659fd93ull) | 1ull;
        bool all = true;
        for (int i = 0; i < k; i++) {
            uint64_t pos = (h1 + (uint64_t)i * h2) % nbits;
            uint64_t word = pos >> 6, bit = 1ull << (pos & 63);
            if (!(bits[word] & bit)) {
                all = false;
                if (insert_if_absent) bits[word] |= bit;
            }
        }
        return all;
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

    ExactHeap(uint64_t cap_, uint32_t min_cov_, uint64_t bloom_bytes)
        : cap(cap_), min_cov(min_cov_), multiplicity_sum(0),
          bloom(bloom_bytes ? new Bloom(bloom_bytes) : nullptr),
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
                       uint64_t bloom_bytes) {
    return new ExactHeap(cap, min_cov, bloom_bytes);
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
// FASTA/FASTQ parsing over a decompressed buffer.
//
// Produces: packed sequence bytes (records back-to-back, no separators —
// the Python side inserts 0x00 separators when chunking), per-record
// sequence lengths, and header (name+comment) spans into the input.
// ---------------------------------------------------------------------------

int64_t mash_fastx_parse(const uint8_t* data, int64_t n,
                         uint8_t* seq_out, int64_t seq_cap,
                         int64_t* seq_len, int64_t* hdr_off,
                         int64_t* hdr_len, int64_t max_records) {
    int64_t i = 0;
    int64_t nrec = 0;
    int64_t seq_pos = 0;

    while (i < n) {
        // find a record marker at line start
        uint8_t c = data[i];
        if (c != '>' && c != '@') {
            while (i < n && data[i] != '\n') i++;
            i++;
            continue;
        }
        bool fastq = (c == '@');
        int64_t hs = i + 1;
        while (i < n && data[i] != '\n') i++;
        int64_t he = i;
        if (he > hs && data[he - 1] == '\r') he--;
        i++;  // past newline
        if (nrec >= max_records) return -1;
        hdr_off[nrec] = hs;
        hdr_len[nrec] = he - hs;

        int64_t len = 0;
        if (!fastq) {
            while (i < n && data[i] != '>' && data[i] != '@') {
                int64_t ls = i;
                while (i < n && data[i] != '\n') i++;
                int64_t le = i;
                if (le > ls && data[le - 1] == '\r') le--;
                if (le > ls) {
                    if (seq_pos + (le - ls) > seq_cap) return -2;
                    memcpy(seq_out + seq_pos, data + ls, le - ls);
                    seq_pos += le - ls;
                    len += le - ls;
                }
                i++;
            }
        } else {
            // sequence lines until '+'
            while (i < n && data[i] != '+') {
                int64_t ls = i;
                while (i < n && data[i] != '\n') i++;
                int64_t le = i;
                if (le > ls && data[le - 1] == '\r') le--;
                if (le > ls) {
                    if (seq_pos + (le - ls) > seq_cap) return -2;
                    memcpy(seq_out + seq_pos, data + ls, le - ls);
                    seq_pos += le - ls;
                    len += le - ls;
                }
                i++;
            }
            // skip '+' line
            while (i < n && data[i] != '\n') i++;
            i++;
            // skip quality: as many bytes as the sequence
            int64_t q = 0;
            while (i < n && q < len) {
                int64_t ls = i;
                while (i < n && data[i] != '\n') i++;
                int64_t le = i;
                if (le > ls && data[le - 1] == '\r') le--;
                q += le - ls;
                i++;
            }
        }
        seq_len[nrec] = len;
        nrec++;
    }
    return nrec;
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
