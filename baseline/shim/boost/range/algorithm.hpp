// Shim: boost::range::random_shuffle (src/phenotype.cpp:318,321).
// Fisher-Yates using the generator's std::random_shuffle protocol
// gen(n) -> uniform on [0, n).
#pragma once

#include <utility>

namespace boost {
namespace range {

template <class Range, class Generator>
Range &random_shuffle(Range &rng, Generator &gen) {
    auto first = rng.begin();
    auto n = rng.end() - first;
    for (decltype(n) i = n - 1; i > 0; --i) {
        std::swap(first[i], first[gen(i + 1)]);
    }
    return rng;
}

}  // namespace range
}  // namespace boost
