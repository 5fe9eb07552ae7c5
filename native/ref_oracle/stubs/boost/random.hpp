// boost.random surface used by caffe math_functions/rng via <random>.
// Distribution VALUES may differ from real boost — acceptable: the oracle
// loads all weights from a caffemodel, so filler RNG output is discarded.
#ifndef REF_ORACLE_BOOST_RANDOM_HPP_
#define REF_ORACLE_BOOST_RANDOM_HPP_
#include <random>

namespace boost {

using mt19937 = std::mt19937;

template <typename T>
class uniform_real : public std::uniform_real_distribution<T> {
 public:
  uniform_real(T a, T b) : std::uniform_real_distribution<T>(a, b) {}
};

template <typename T = int>
class uniform_int : public std::uniform_int_distribution<T> {
 public:
  uniform_int(T a, T b) : std::uniform_int_distribution<T>(a, b) {}
};

template <typename T>
class normal_distribution : public std::normal_distribution<T> {
 public:
  normal_distribution(T mean, T sigma)
      : std::normal_distribution<T>(mean, sigma) {}
};

template <typename T>
class bernoulli_distribution {
 public:
  explicit bernoulli_distribution(T p) : d_(static_cast<double>(p)) {}
  template <typename G>
  bool operator()(G& g) {
    return d_(g);
  }

 private:
  std::bernoulli_distribution d_;
};

template <typename Engine, typename Dist>
class variate_generator {
 public:
  variate_generator(Engine e, Dist d) : e_(e), d_(d) {}
  typename Dist::result_type operator()() { return d_(*e_); }

 private:
  Engine e_;  // caffe instantiates with rng_t* (pointer)
  Dist d_;
};

template <typename Engine, typename T>
class variate_generator<Engine, bernoulli_distribution<T>> {
 public:
  variate_generator(Engine e, bernoulli_distribution<T> d) : e_(e), d_(d) {}
  bool operator()() { return d_(*e_); }

 private:
  Engine e_;
  bernoulli_distribution<T> d_;
};

}  // namespace boost
#endif
