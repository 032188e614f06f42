// Host-side proportional-PER sum-tree, C API for ctypes.
//
// Native-component parity with the reference's only C++ module
// (srl/rl/memories/priority_memories/cpp_module/src/proportional_memory.cpp:14-250,
// a pybind11 SumTree/ProportionalMemory). Role here: the HOST path of prioritized
// replay — used when experience lives host-side (gymnasium adapter envs, external
// actors feeding over DCN) where the device-resident bucketed sampler
// (memories/priority_buffer.py) doesn't apply. Unlike the reference it is batch-first:
// add/update/sample operate on arrays per call so the python boundary is crossed once
// per batch, not once per item.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsumtree.so sumtree.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct SumTree {
    int64_t capacity;      // leaf count (power of two >= requested)
    int64_t requested;     // user capacity
    int64_t write;         // ring cursor over [0, requested)
    int64_t size;          // live items
    double max_priority;   // in exponentiated domain
    double alpha;
    double eps;
    std::vector<double> tree;  // 2*capacity doubles; leaves at [capacity, 2*capacity)
    std::mt19937_64 rng;

    explicit SumTree(int64_t cap, double alpha_, double eps_, uint64_t seed)
        : requested(cap), write(0), size(0), max_priority(1.0), alpha(alpha_), eps(eps_) {
        capacity = 1;
        while (capacity < cap) capacity <<= 1;
        tree.assign(2 * capacity, 0.0);
        rng.seed(seed);
    }

    inline void set_leaf(int64_t idx, double p) {
        int64_t i = idx + capacity;
        double delta = p - tree[i];
        tree[i] = p;
        for (i >>= 1; i >= 1; i >>= 1) tree[i] += delta;
    }

    inline double total() const { return tree[1]; }

    inline int64_t retrieve(double val) const {
        int64_t i = 1;
        while (i < capacity) {
            int64_t l = 2 * i;
            if (val <= tree[l]) {
                i = l;
            } else {
                val -= tree[l];
                i = l + 1;
            }
        }
        return i - capacity;
    }
};

inline double expo(const SumTree* t, double raw) {
    double a = raw < 0 ? -raw : raw;
    return std::pow(a + t->eps, t->alpha);
}

}  // namespace

extern "C" {

void* sumtree_new(int64_t capacity, double alpha, double eps, uint64_t seed) {
    return new SumTree(capacity, alpha, eps, seed);
}

void sumtree_free(void* h) { delete static_cast<SumTree*>(h); }

int64_t sumtree_size(void* h) { return static_cast<SumTree*>(h)->size; }

double sumtree_total(void* h) { return static_cast<SumTree*>(h)->total(); }

double sumtree_max_priority(void* h) { return static_cast<SumTree*>(h)->max_priority; }

// batch add at max priority; returns slot indices in `out_slots`
void sumtree_add(void* h, int64_t n, int64_t* out_slots) {
    auto* t = static_cast<SumTree*>(h);
    for (int64_t k = 0; k < n; ++k) {
        int64_t slot = t->write;
        t->set_leaf(slot, t->max_priority);
        out_slots[k] = slot;
        t->write = (t->write + 1) % t->requested;
        if (t->size < t->requested) t->size++;
    }
}

// batch add with explicit raw priorities (exponentiated internally)
void sumtree_add_with_priority(void* h, int64_t n, const double* raw, int64_t* out_slots) {
    auto* t = static_cast<SumTree*>(h);
    for (int64_t k = 0; k < n; ++k) {
        double p = expo(t, raw[k]);
        if (p > t->max_priority) t->max_priority = p;
        int64_t slot = t->write;
        t->set_leaf(slot, p);
        out_slots[k] = slot;
        t->write = (t->write + 1) % t->requested;
        if (t->size < t->requested) t->size++;
    }
}

// batch priority update (proportional_memory.cpp update/propagate)
void sumtree_update(void* h, int64_t n, const int64_t* slots, const double* raw) {
    auto* t = static_cast<SumTree*>(h);
    for (int64_t k = 0; k < n; ++k) {
        double p = expo(t, raw[k]);
        if (p > t->max_priority) t->max_priority = p;
        t->set_leaf(slots[k], p);
    }
}

// batch proportional sample with IS weights (proportional_memory.cpp sample):
// beta-annealed weights normalized by the batch max.
void sumtree_sample(void* h, int64_t batch, double beta, int64_t* out_slots, double* out_weights) {
    auto* t = static_cast<SumTree*>(h);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    double tot = t->total();
    double wmax = 1e-30;
    for (int64_t k = 0; k < batch; ++k) {
        int64_t slot = 0;
        for (int tries = 0; tries < 9999; ++tries) {
            double r = uni(t->rng) * tot;
            slot = t->retrieve(r);
            if (slot < t->requested && t->tree[slot + t->capacity] > 0.0) break;
        }
        out_slots[k] = slot;
        double prob = t->tree[slot + t->capacity] / tot;
        double w = std::pow(static_cast<double>(t->size) * prob, -beta);
        out_weights[k] = w;
        if (w > wmax) wmax = w;
    }
    for (int64_t k = 0; k < batch; ++k) out_weights[k] /= wmax;
}

// serialize leaves for checkpointing
void sumtree_get_leaves(void* h, double* out) {
    auto* t = static_cast<SumTree*>(h);
    std::memcpy(out, t->tree.data() + t->capacity, sizeof(double) * t->requested);
}

void sumtree_set_leaves(void* h, const double* in, int64_t n, int64_t write, int64_t size,
                        double max_priority) {
    auto* t = static_cast<SumTree*>(h);
    for (int64_t i = 0; i < n && i < t->requested; ++i) t->set_leaf(i, in[i]);
    t->write = write;
    t->size = size;
    t->max_priority = max_priority;
}

}  // extern "C"
