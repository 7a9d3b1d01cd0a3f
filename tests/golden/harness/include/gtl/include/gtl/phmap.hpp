// gtl::flat_hash_map stand-in for golden-fixture generation. The reference
// uses it as an unordered associative map; the only iteration-order-dependent
// output is the ELEMENT ORDER of each path_freq / path_prob_dist row
// (DeNovoAssembler.cpp:394-421 iterates bp_matrix), which downstream feeds an
// order-invariant two-sample KS test (DeNovoAssembler.R:419-426). Fixtures
// therefore compare those rows as sorted multisets; all scalar scores,
// counts, contigs and solutions are iteration-order-free, so
// std::unordered_map is semantically interchangeable.
#pragma once

#include <unordered_map>

namespace gtl {
template <class K, class V, class... Rest>
using flat_hash_map = std::unordered_map<K, V, Rest...>;
}  // namespace gtl
