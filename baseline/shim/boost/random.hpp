// Minimal boost.random API shim over <random> for building the reference
// gmrm baseline (this image ships no Boost headers).  Provides exactly the
// names the reference uses (src/distributions.hpp, src/phenotype.cpp):
// mt19937, gamma/beta/normal/uniform_real distributions, variate_generator.
// Draws are correctly distributed but NOT bit-identical to real Boost —
// irrelevant here, since the cross-implementation comparison target is
// distributional (MCMC) equivalence, not bitwise (SURVEY.md §7).
#pragma once

#include <cstddef>
#include <random>

namespace boost {

typedef std::mt19937 mt19937;

namespace random {

template <class RealType = double>
using gamma_distribution = std::gamma_distribution<RealType>;

template <class RealType = double>
using normal_distribution = std::normal_distribution<RealType>;

template <class RealType = double>
using uniform_real_distribution = std::uniform_real_distribution<RealType>;

// Beta(a, b) via two gamma draws: X/(X+Y) with X~Gamma(a,1), Y~Gamma(b,1).
template <class RealType = double>
class beta_distribution {
  public:
    typedef RealType result_type;
    beta_distribution(RealType a, RealType b) : ga_(a, 1.0), gb_(b, 1.0) {}
    template <class Engine>
    RealType operator()(Engine &eng) {
        RealType x = ga_(eng), y = gb_(eng);
        return x / (x + y);
    }
  private:
    std::gamma_distribution<RealType> ga_, gb_;
};

// boost::variate_generator: binds an engine reference to a distribution.
// operator()(n) is the std::random_shuffle protocol: uniform on [0, n).
template <class Engine, class Dist>
class variate_generator {
  public:
    typedef typename Dist::result_type result_type;
    variate_generator(Engine e, Dist d) : eng_(e), dist_(d) {}
    result_type operator()() { return dist_(eng_); }
    template <class T>
    result_type operator()(T n) {
        return static_cast<result_type>(
            std::uniform_int_distribution<long long>(
                0, static_cast<long long>(n) - 1)(eng_));
    }
  private:
    Engine eng_;
    Dist dist_;
};

}  // namespace random

using random::beta_distribution;
using random::normal_distribution;
using random::uniform_real_distribution;
using random::variate_generator;

}  // namespace boost
