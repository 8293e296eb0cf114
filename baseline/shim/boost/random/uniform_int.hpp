// Shim: boost::uniform_int (used by the reference only to parameterize a
// variate_generator for marker shuffling, src/phenotype.cpp:315-321).
#pragma once

#include "../random.hpp"

namespace boost {

template <class IntType = int>
class uniform_int {
  public:
    typedef IntType result_type;
    uniform_int(IntType lo, IntType hi) : dist_(lo, hi) {}
    template <class Engine>
    IntType operator()(Engine &eng) { return dist_(eng); }
  private:
    std::uniform_int_distribution<IntType> dist_;
};

}  // namespace boost
