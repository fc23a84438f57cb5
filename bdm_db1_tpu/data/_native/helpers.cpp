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

// BERT-style sentence-pair sample map (reference: helpers.cpp:221-~470
// build_mapping): group consecutive sentences of each document into samples
// of ~target length (randomly shortened with prob short_seq_prob), two-pass
// (count, then fill), then in-place Fisher-Yates shuffle. Rows are
// (sentence_start, sentence_end, target_seq_length).
//
// First call with out == nullptr to get the row count; allocate; call again.
int64_t build_mapping(const int64_t* docs, int64_t n_docs_plus1,
                      const int64_t* sizes, int64_t num_epochs,
                      int64_t max_num_samples, int64_t max_seq_length,
                      double short_seq_prob, uint64_t seed, int64_t* out) {
    const int64_t n_docs = n_docs_plus1 - 1;
    uint64_t rstate = seed ? seed : 1;
    auto next_rand = [&rstate]() {
        // xorshift64* — deterministic across platforms
        rstate ^= rstate >> 12;
        rstate ^= rstate << 25;
        rstate ^= rstate >> 27;
        return rstate * 2685821657736338717ULL;
    };
    auto rand_double = [&]() {
        return (next_rand() >> 11) * (1.0 / 9007199254740992.0);
    };
    auto rand_range = [&](int64_t lo, int64_t hi) {  // [lo, hi]
        return lo + static_cast<int64_t>(next_rand() % (hi - lo + 1));
    };

    int64_t count = 0;
    for (int64_t epoch = 0; epoch < num_epochs; ++epoch) {
        for (int64_t d = 0; d < n_docs; ++d) {
            const int64_t s_begin = docs[d];
            const int64_t s_end = docs[d + 1];
            if (s_end - s_begin < 1) continue;
            int64_t target = max_seq_length;
            if (rand_double() < short_seq_prob) {
                target = rand_range(2, max_seq_length);
            }
            int64_t start = s_begin;
            int64_t acc = 0;
            for (int64_t s = s_begin; s < s_end; ++s) {
                acc += sizes[s];
                const bool last = (s == s_end - 1);
                if (acc >= target || last) {
                    if (s > start || sizes[start] > 1) {
                        if (count >= num_epochs * max_num_samples &&
                            max_num_samples > 0) {
                            goto done;
                        }
                        if (out != nullptr) {
                            out[count * 3 + 0] = start;
                            out[count * 3 + 1] = s + 1;
                            out[count * 3 + 2] = target;
                        }
                        ++count;
                    }
                    start = s + 1;
                    acc = 0;
                    target = max_seq_length;
                    if (rand_double() < short_seq_prob) {
                        target = rand_range(2, max_seq_length);
                    }
                }
            }
        }
    }
done:
    if (out != nullptr && count > 1) {
        // in-place Fisher-Yates shuffle (reference: helpers.cpp shuffle pass)
        for (int64_t i = count - 1; i > 0; --i) {
            const int64_t j = static_cast<int64_t>(next_rand() % (i + 1));
            for (int k = 0; k < 3; ++k) {
                const int64_t t = out[i * 3 + k];
                out[i * 3 + k] = out[j * 3 + k];
                out[j * 3 + k] = t;
            }
        }
    }
    return count;
}

// ICT/block-style map (reference: helpers.cpp:~470-728 build_blocks_mapping):
// like build_mapping but each sample also records its document id, so block
// samples can pair with their title. Rows are
// (sentence_start, sentence_end, doc_id, target_seq_length).
int64_t build_blocks_mapping(const int64_t* docs, int64_t n_docs_plus1,
                             const int64_t* sizes, const int64_t* doc_ids,
                             int64_t num_epochs, int64_t max_num_samples,
                             int64_t max_seq_length, double short_seq_prob,
                             uint64_t seed, int64_t* out) {
    const int64_t n_docs = n_docs_plus1 - 1;
    uint64_t rstate = seed ? seed : 1;
    auto next_rand = [&rstate]() {
        rstate ^= rstate >> 12;
        rstate ^= rstate << 25;
        rstate ^= rstate >> 27;
        return rstate * 2685821657736338717ULL;
    };
    auto rand_double = [&]() {
        return (next_rand() >> 11) * (1.0 / 9007199254740992.0);
    };
    auto rand_range = [&](int64_t lo, int64_t hi) {
        return lo + static_cast<int64_t>(next_rand() % (hi - lo + 1));
    };

    int64_t count = 0;
    for (int64_t epoch = 0; epoch < num_epochs; ++epoch) {
        for (int64_t d = 0; d < n_docs; ++d) {
            const int64_t s_begin = docs[d];
            const int64_t s_end = docs[d + 1];
            if (s_end - s_begin < 1) continue;
            int64_t target = max_seq_length;
            if (rand_double() < short_seq_prob) {
                target = rand_range(2, max_seq_length);
            }
            int64_t start = s_begin;
            int64_t acc = 0;
            for (int64_t s = s_begin; s < s_end; ++s) {
                acc += sizes[s];
                const bool last = (s == s_end - 1);
                if (acc >= target || last) {
                    if (count >= num_epochs * max_num_samples &&
                        max_num_samples > 0) {
                        goto done2;
                    }
                    if (out != nullptr) {
                        out[count * 4 + 0] = start;
                        out[count * 4 + 1] = s + 1;
                        out[count * 4 + 2] = doc_ids ? doc_ids[d] : d;
                        out[count * 4 + 3] = target;
                    }
                    ++count;
                    start = s + 1;
                    acc = 0;
                    target = max_seq_length;
                    if (rand_double() < short_seq_prob) {
                        target = rand_range(2, max_seq_length);
                    }
                }
            }
        }
    }
done2:
    if (out != nullptr && count > 1) {
        for (int64_t i = count - 1; i > 0; --i) {
            const int64_t j = static_cast<int64_t>(next_rand() % (i + 1));
            for (int k = 0; k < 4; ++k) {
                const int64_t t = out[i * 4 + k];
                out[i * 4 + k] = out[j * 4 + k];
                out[j * 4 + k] = t;
            }
        }
    }
    return count;
}

}  // extern "C"
