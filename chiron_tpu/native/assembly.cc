// Overlap-consensus assembly (glue/stick kernels) for very long reads.
//
// Native equivalent of the Python loop in chiron_tpu/assembly/consensus.py
// (itself a re-design of chiron/utils/easy_assembler.py:276-300,393-442):
// the per-window glue displacement search is O(k^2) in the overlap bound
// and the count accumulation is O(len) per window — fine in numpy for
// example-sized reads, but a megabase read with thousands of windows
// deserves a single native pass. Semantics are identical to the Python
// kernels (scoring 2*matches - overlap, displacement = prev_len - best).
//
// Exposed as a C ABI for ctypes (chiron_tpu/assembly/consensus.py).

#include <algorithm>
#include <cstdint>

namespace {

inline int base_index(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return -1;
  }
}

// Best suffix(prev)/prefix(cur) overlap length (glue kernel).
long long glue_overlap(const char* prev, long long prev_n,
                       const char* cur, long long cur_n) {
  long long max_overlap = std::min(prev_n / 10, cur_n);
  long long best_i = 0, best_score = 0;
  for (long long i = 1; i < max_overlap; ++i) {
    long long matches = 0;
    const char* tail = prev + prev_n - i;
    for (long long j = 0; j < i; ++j) matches += (cur[j] == tail[j]);
    long long score = 2 * matches - i;
    if (score > best_score) {
      best_score = score;
      best_i = i;
    }
  }
  return best_i;
}

}  // namespace

extern "C" {

// Assemble n_windows base strings (concatenated in `bases`, window w spans
// bases[offsets[w] .. offsets[w+1])) into [4, cap] consensus count and
// quality matrices (row-major doubles, caller-zeroed). `stick` selects the
// stick kernel (displacement = len(prev)) instead of glue. Returns the
// consensus length, or -needed_capacity if cap is too small.
long long chiron_assemble_glue(const char* bases, const long long* offsets,
                               long long n_windows, const float* qs,
                               int stick, double* consensus,
                               double* consensus_qs, long long cap) {
  long long pos = 0, length = 0;
  for (long long w = 0; w < n_windows; ++w) {
    const char* cur = bases + offsets[w];
    const long long cur_n = offsets[w + 1] - offsets[w];
    long long start;
    if (w == 0) {
      start = 0;
    } else {
      const char* prev = bases + offsets[w - 1];
      const long long prev_n = offsets[w] - offsets[w - 1];
      const long long disp =
          stick ? prev_n : prev_n - glue_overlap(prev, prev_n, cur, cur_n);
      pos += disp;
      start = pos > 0 ? pos : 0;
    }
    const long long end = start + cur_n;
    if (end > cap) return -(end + 1);
    const double q = qs ? static_cast<double>(qs[w]) : 0.0;
    for (long long j = 0; j < cur_n; ++j) {
      const int b = base_index(cur[j]);
      if (b < 0) continue;
      consensus[b * cap + start + j] += 1.0;
      if (consensus_qs) consensus_qs[b * cap + start + j] += q;
    }
    length = std::max(length, end);
  }
  return length;
}

}  // extern "C"
