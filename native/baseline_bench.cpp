// Honest CPU baseline measurement for bench.py.
//
// The reference (marbl/Mash 2.3) cannot be built in this environment
// (libcapnp/GSL unavailable, no network), so this is a faithful
// single-core C++ reimplementation of its three hot loops, measured on
// this machine and used as the denominator for vs_baseline:
//
//  1. sketch: the addMinHashes k-mer walk (src/mash/Sketch.cpp:512-583)
//     — uppercase, reverse complement, canonical min(fwd,rc) by memcmp,
//     MurmurHash3_x64_128, bottom-s heap insert
//     (src/mash/MinHashHeap.cpp:68-146).
//  2. dist: the compareSketches merge walk with union cap
//     (src/mash/CommandDistance.cpp:336-425).
//  3. screen: the hashSequence loop (src/mash/CommandScreen.cpp:484-599)
//     — per-k-mer canonical hash + hash-table hit counting (the
//     reference uses a robin_hood map; an open-addressing table here
//     keeps the comparison fair) + heap insert for cardinality.
//
// MurmurHash3 is implemented from the public-domain algorithm spec.
// All loops are written fresh; only the *semantics* follow the cited
// reference lines.  Single thread; mash scales ~linearly with -p.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <queue>
#include <random>
#include <unordered_map>
#include <vector>
#include <algorithm>

// ---------------------------------------------------------------------------
// MurmurHash3 x64_128 (public-domain algorithm by Austin Appleby),
// written from the spec.  Only the low 64 bits are used (hash.cpp:21-35
// keeps the first 8 bytes).
// ---------------------------------------------------------------------------
static inline uint64_t rotl64(uint64_t x, int8_t r) {
    return (x << r) | (x >> (64 - r));
}
static inline uint64_t fmix64(uint64_t k) {
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdull;
    k ^= k >> 33;
    k *= 0xc4ceb9fe1a85ec53ull;
    k ^= k >> 33;
    return k;
}

static uint64_t mmh3_x64_128_lo(const void* key, int len, uint32_t seed) {
    const uint8_t* data = (const uint8_t*)key;
    const int nblocks = len / 16;
    uint64_t h1 = seed, h2 = seed;
    const uint64_t c1 = 0x87c37b91114253d5ull;
    const uint64_t c2 = 0x4cf5ad432745937full;

    for (int i = 0; i < nblocks; i++) {
        uint64_t k1, k2;
        memcpy(&k1, data + i * 16, 8);
        memcpy(&k2, data + i * 16 + 8, 8);
        k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
        h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729;
        k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
        h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5;
    }

    const uint8_t* tail = data + nblocks * 16;
    uint64_t k1 = 0, k2 = 0;
    switch (len & 15) {
    case 15: k2 ^= (uint64_t)tail[14] << 48; [[fallthrough]];
    case 14: k2 ^= (uint64_t)tail[13] << 40; [[fallthrough]];
    case 13: k2 ^= (uint64_t)tail[12] << 32; [[fallthrough]];
    case 12: k2 ^= (uint64_t)tail[11] << 24; [[fallthrough]];
    case 11: k2 ^= (uint64_t)tail[10] << 16; [[fallthrough]];
    case 10: k2 ^= (uint64_t)tail[9] << 8; [[fallthrough]];
    case 9:
        k2 ^= (uint64_t)tail[8];
        k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
        [[fallthrough]];
    case 8: k1 ^= (uint64_t)tail[7] << 56; [[fallthrough]];
    case 7: k1 ^= (uint64_t)tail[6] << 48; [[fallthrough]];
    case 6: k1 ^= (uint64_t)tail[5] << 40; [[fallthrough]];
    case 5: k1 ^= (uint64_t)tail[4] << 32; [[fallthrough]];
    case 4: k1 ^= (uint64_t)tail[3] << 24; [[fallthrough]];
    case 3: k1 ^= (uint64_t)tail[2] << 16; [[fallthrough]];
    case 2: k1 ^= (uint64_t)tail[1] << 8; [[fallthrough]];
    case 1:
        k1 ^= (uint64_t)tail[0];
        k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    }

    h1 ^= (uint64_t)len; h2 ^= (uint64_t)len;
    h1 += h2; h2 += h1;
    h1 = fmix64(h1); h2 = fmix64(h2);
    h1 += h2;
    return h1;
}

// ---------------------------------------------------------------------------
// Bottom-s selector with the reference's cost profile: hash->count map
// + max-heap, gate on (size < s || h < top).
// ---------------------------------------------------------------------------
struct BottomS {
    uint64_t s;
    std::unordered_map<uint64_t, uint32_t> counts;
    std::priority_queue<uint64_t> q;

    explicit BottomS(uint64_t s_) : s(s_) { counts.reserve(2 * s_); }

    inline void insert(uint64_t h) {
        if (!(counts.size() < s || h < q.top())) return;
        auto r = counts.emplace(h, 1);
        if (r.second) {
            q.push(h);
            if (counts.size() > s) {
                counts.erase(q.top());
                q.pop();
            }
        } else {
            r.first->second++;
        }
    }
};

static const char COMP[26] = {'T', 'V', 'G', 'H', 'N', 'N', 'C', 'D',
                              'N', 'N', 'M', 'N', 'K', 'N', 'N', 'N',
                              'N', 'Y', 'S', 'A', 'A', 'B', 'W', 'N',
                              'R', 'N'};

// The addMinHashes walk: canonical = min(fwd, revcomp) by memcmp.
static double bench_sketch(int64_t n_bases, int k, int s) {
    std::mt19937_64 rng(7);
    std::vector<char> seq(n_bases);
    const char* B = "ACGT";
    for (int64_t i = 0; i < n_bases; i++) seq[i] = B[rng() & 3];

    std::vector<char> rc(k);
    BottomS heap(s);
    auto t0 = std::chrono::steady_clock::now();
    for (int64_t i = 0; i + k <= n_bases; i++) {
        const char* fwd = seq.data() + i;
        for (int j = 0; j < k; j++)
            rc[k - 1 - j] = COMP[fwd[j] - 'A'];
        const char* kmer =
            memcmp(fwd, rc.data(), k) <= 0 ? fwd : rc.data();
        heap.insert(mmh3_x64_128_lo(kmer, k, 42));
    }
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    return (double)n_bases / dt;
}

// The compareSketches merge walk with the union-size cap.
static double bench_pairwise(int s, int64_t iters) {
    std::mt19937_64 rng(9);
    std::vector<uint64_t> a(s), b(s);
    for (int i = 0; i < s; i++) { a[i] = rng(); b[i] = rng(); }
    // ~30% shared hashes like related genomes
    for (int i = 0; i < s / 3; i++) b[i] = a[i];
    std::sort(a.begin(), a.end());
    std::sort(b.begin(), b.end());

    volatile int64_t sink = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int64_t it = 0; it < iters; it++) {
        int64_t common = 0, denom = 0;
        size_t i = 0, j = 0;
        while (denom < s && i < a.size() && j < b.size()) {
            if (a[i] < b[j]) i++;
            else if (b[j] < a[i]) j++;
            else { i++; j++; common++; }
            denom++;
        }
        sink += common;
    }
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    (void)sink;
    return (double)iters / dt;
}

// Open-addressing hash table (power-of-2, linear probing) standing in
// for the reference's robin_hood::unordered_map hit counter.
struct FlatMap {
    std::vector<uint64_t> keys;
    std::vector<uint32_t> vals;
    uint64_t mask;

    explicit FlatMap(size_t n) {
        size_t cap = 1;
        while (cap < n * 2) cap <<= 1;
        keys.assign(cap, ~0ull);
        vals.assign(cap, 0);
        mask = cap - 1;
    }
    inline void put(uint64_t k) {
        uint64_t i = fmix64(k) & mask;
        while (keys[i] != ~0ull && keys[i] != k) i = (i + 1) & mask;
        keys[i] = k;
    }
    inline bool bump(uint64_t k) {
        uint64_t i = fmix64(k) & mask;
        while (keys[i] != ~0ull) {
            if (keys[i] == k) { vals[i]++; return true; }
            i = (i + 1) & mask;
        }
        return false;
    }
};

// The screen hashSequence loop: canonical hash + table hit + heap.
static double bench_screen(int64_t n_bases, int k, int s,
                           int64_t db_size) {
    std::mt19937_64 rng(11);
    std::vector<char> seq(n_bases);
    const char* B = "ACGT";
    for (int64_t i = 0; i < n_bases; i++) seq[i] = B[rng() & 3];

    FlatMap table((size_t)db_size);
    for (int64_t i = 0; i < db_size; i++) table.put(rng());
    BottomS heap(s);

    std::vector<char> rc(k);
    auto t0 = std::chrono::steady_clock::now();
    for (int64_t i = 0; i + k <= n_bases; i++) {
        const char* fwd = seq.data() + i;
        for (int j = 0; j < k; j++)
            rc[k - 1 - j] = COMP[fwd[j] - 'A'];
        const char* kmer =
            memcmp(fwd, rc.data(), k) <= 0 ? fwd : rc.data();
        uint64_t h = mmh3_x64_128_lo(kmer, k, 42);
        heap.insert(h);
        table.bump(h);
    }
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    return (double)n_bases / dt;
}

int main() {
    double sk = bench_sketch(20'000'000, 21, 1000);
    double pw = bench_pairwise(1000, 300'000);
    double sc = bench_screen(20'000'000, 21, 1000, 1'000'000);
    // one JSON line consumed by bench.py
    printf("{\"sketch_bases_per_sec\": %.1f, "
           "\"pairwise_pairs_per_sec\": %.1f, "
           "\"screen_bases_per_sec\": %.1f}\n",
           sk, pw, sc);
    return 0;
}
