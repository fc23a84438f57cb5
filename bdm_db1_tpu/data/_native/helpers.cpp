// Native dataset index builders (C ABI, loaded via ctypes).
//
// TPU-native counterpart of the reference's pybind11 helpers
// (reference: src/data/helpers.cpp:20-203, exports :730-736). Same
// algorithms, plain C ABI + caller-allocated numpy buffers instead of
// pybind11, so no build-time Python dependency is needed.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 helpers.cpp -o libdb1helpers.so

#include <cstdint>
#include <algorithm>
#include <cmath>
#include <random>

extern "C" {

// (path, start, end=min(start+transition_num, len)) triple for every
// timestep of every trajectory (reference: helpers.cpp:82-115).
// out: [sum(path_lengths), 3] int64.
void build_rl_sample_idx(const int64_t* path_lengths, int64_t n_paths,
                         int64_t transition_num, int64_t* out) {
    int64_t row = 0;
    for (int64_t p = 0; p < n_paths; ++p) {
        const int64_t n = path_lengths[p];
        for (int64_t i = 0; i < n; ++i) {
            out[row * 3 + 0] = p;
            out[row * 3 + 1] = i;
            out[row * 3 + 2] = std::min(i + transition_num, n);
            ++row;
        }
    }
}

// GPT token-packing index (reference: helpers.cpp:117-203). Each sample
// spans seq_length+1 tokens; the boundary token is shared between
// consecutive samples. out: [num_samples+1, 2] of (doc position, offset).
void build_sample_idx(const int64_t* sizes, const int64_t* doc_idx,
                      int64_t seq_length, int64_t num_samples, int64_t* out) {
    int64_t cur_doc = 0;
    int64_t cur_offset = 0;
    out[0] = 0;
    out[1] = 0;
    for (int64_t s = 1; s <= num_samples; ++s) {
        int64_t remaining = seq_length + 1;
        while (remaining > 0) {
            const int64_t doc_len = sizes[doc_idx[cur_doc]] - cur_offset;
            remaining -= doc_len;
            if (remaining <= 0) {
                cur_offset += remaining + doc_len - 1;
                remaining = 0;
            } else {
                ++cur_doc;
                cur_offset = 0;
            }
        }
        out[s * 2 + 0] = cur_doc;
        out[s * 2 + 1] = cur_offset;
    }
}

// Error-minimizing weighted round-robin over datasets
// (reference: helpers.cpp:20-80).
void build_blending_indices(const double* weights, int64_t n_datasets,
                            int64_t size, int32_t* dataset_index,
                            int64_t* dataset_sample_index) {
    // running sample counts per dataset
    int64_t* counts = new int64_t[n_datasets]();
    for (int64_t i = 0; i < size; ++i) {
        double best_err = -1e300;
        int64_t best = 0;
        const double target = static_cast<double>(i + 1);
        for (int64_t j = 0; j < n_datasets; ++j) {
            const double err = weights[j] * target - static_cast<double>(counts[j]);
            if (err > best_err) {
                best_err = err;
                best = j;
            }
        }
        dataset_index[i] = static_cast<int32_t>(best);
        dataset_sample_index[i] = counts[best];
        ++counts[best];
    }
    delete[] counts;
}

// ---------------------------------------------------------------------------
// BERT/ICT sentence-block sample maps. Algorithm-exact re-implementations of
// the reference's build_mapping / build_blocks_mapping
// (reference: src/data/helpers.cpp:205-728): same std::mt19937(seed) target-
// length draws (one uint32 draw per eligible document start and per emitted
// sample when short_seq_prob > 0), same emission rule (reach target length
// with >1 / >=min sentences remaining, or exhaust the document), same
// LONG_SENTENCE_LEN=512 document exclusion, same epoch-boundary sample cap
// (checked at epoch start only, so the final epoch may overshoot
// max_num_samples), and the same std::mt19937_64(seed + 1) Fisher-Yates
// shuffle. The C ABI replaces pybind11: call once with out == nullptr for
// the row count, allocate, call again to fill (the fresh seeded RNG replays
// the identical draw sequence, standing in for the reference's two-pass
// loop over one generator).
// ---------------------------------------------------------------------------

static const int32_t LONG_SENTENCE_LEN = 512;

static inline int32_t target_sample_len(int32_t short_seq_ratio,
                                        int32_t max_length,
                                        std::mt19937& gen) {
    if (short_seq_ratio == 0) {
        return max_length;  // no draw (reference: helpers.cpp:205-218)
    }
    const uint32_t r = gen();
    if ((r % static_cast<uint32_t>(short_seq_ratio)) == 0) {
        return 2 + static_cast<int32_t>(
            r % static_cast<uint32_t>(max_length - 1));
    }
    return max_length;
}

static void shuffle_rows(int64_t* out, int64_t count, int64_t width,
                         uint64_t seed) {
    std::mt19937_64 gen(seed);
    for (int64_t i = count - 1; i > 0; --i) {
        const int64_t j = static_cast<int64_t>(gen() % (i + 1));
        for (int64_t k = 0; k < width; ++k) {
            std::swap(out[i * width + k], out[j * width + k]);
        }
    }
}

// Rows: (sentence_start, sentence_end, target_seq_length).
int64_t build_mapping(const int64_t* docs, int64_t n_docs_plus1,
                      const int32_t* sizes, int32_t num_epochs,
                      uint64_t max_num_samples, int32_t max_seq_length,
                      double short_seq_prob, uint64_t seed,
                      int32_t min_num_sent, int64_t* out) {
    const int64_t n_docs = n_docs_plus1 - 1;
    int32_t short_seq_ratio = 0;
    if (short_seq_prob > 0) {
        short_seq_ratio = static_cast<int32_t>(
            std::round(1.0 / short_seq_prob));
    }
    std::mt19937 gen(static_cast<uint32_t>(seed));

    uint64_t map_index = 0;
    for (int32_t epoch = 0; epoch < num_epochs; ++epoch) {
        if (map_index >= max_num_samples) break;
        for (int64_t d = 0; d < n_docs; ++d) {
            const int64_t first = docs[d];
            const int64_t last = docs[d + 1];
            int64_t prev_start = first;
            int64_t remain = last - first;

            bool has_long = false;
            if (remain > 1) {  // reference gates this scan on >1, not >=min
                for (int64_t s = first; s < last; ++s) {
                    if (sizes[s] > LONG_SENTENCE_LEN) { has_long = true; break; }
                }
            }
            if (remain < min_num_sent || has_long) continue;

            int32_t seq_len = 0;
            int32_t num_sent = 0;
            int32_t target = target_sample_len(short_seq_ratio,
                                               max_seq_length, gen);
            for (int64_t s = first; s < last; ++s) {
                seq_len += sizes[s];
                ++num_sent;
                --remain;
                if ((seq_len >= target && remain > 1 &&
                     num_sent >= min_num_sent) || remain == 0) {
                    if (out != nullptr) {
                        out[map_index * 3 + 0] = prev_start;
                        out[map_index * 3 + 1] = s + 1;
                        out[map_index * 3 + 2] = target;
                    }
                    ++map_index;
                    prev_start = s + 1;
                    target = target_sample_len(short_seq_ratio,
                                               max_seq_length, gen);
                    seq_len = 0;
                    num_sent = 0;
                }
            }
        }
    }
    if (out != nullptr) {
        shuffle_rows(out, static_cast<int64_t>(map_index), 3, seed + 1);
    }
    return static_cast<int64_t>(map_index);
}

// Rows: (sentence_start, sentence_end, doc, block_id); target length is
// max_seq_length - titles_sizes[doc]; block_id restarts every epoch.
int64_t build_blocks_mapping(const int64_t* docs, int64_t n_docs_plus1,
                             const int32_t* sizes,
                             const int32_t* titles_sizes,
                             int32_t num_epochs, uint64_t max_num_samples,
                             int32_t max_seq_length, uint64_t seed,
                             int32_t use_one_sent_blocks, int64_t* out) {
    const int64_t n_docs = n_docs_plus1 - 1;
    const int32_t min_num_sent = use_one_sent_blocks ? 1 : 2;

    uint64_t map_index = 0;
    for (int32_t epoch = 0; epoch < num_epochs; ++epoch) {
        int64_t block_id = 0;
        if (map_index >= max_num_samples) break;
        for (int64_t d = 0; d < n_docs; ++d) {
            const int64_t first = docs[d];
            const int64_t last = docs[d + 1];
            const int32_t target = max_seq_length - titles_sizes[d];
            int64_t prev_start = first;
            int64_t remain = last - first;

            bool has_long = false;
            if (remain >= min_num_sent) {
                for (int64_t s = first; s < last; ++s) {
                    if (sizes[s] > LONG_SENTENCE_LEN) { has_long = true; break; }
                }
            }
            if (remain < min_num_sent || has_long) continue;

            int32_t seq_len = 0;
            int32_t num_sent = 0;
            for (int64_t s = first; s < last; ++s) {
                seq_len += sizes[s];
                ++num_sent;
                --remain;
                if ((seq_len >= target && remain >= min_num_sent &&
                     num_sent >= min_num_sent) || remain == 0) {
                    if (out != nullptr) {
                        out[map_index * 4 + 0] = prev_start;
                        out[map_index * 4 + 1] = s + 1;
                        out[map_index * 4 + 2] = d;
                        out[map_index * 4 + 3] = block_id;
                    }
                    ++map_index;
                    ++block_id;
                    prev_start = s + 1;
                    seq_len = 0;
                    num_sent = 0;
                }
            }
        }
    }
    if (out != nullptr) {
        shuffle_rows(out, static_cast<int64_t>(map_index), 4, seed + 1);
    }
    return static_cast<int64_t>(map_index);
}

}  // extern "C"
