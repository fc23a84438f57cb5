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

}  // extern "C"
