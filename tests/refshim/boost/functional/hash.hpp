// Minimal re-implementation of the Boost.ContainerHash surface used by the
// reference: boost::hash<T>, hash_value, hash_combine, hash_range — written
// from the PUBLISHED algorithms (the same ones replicated in
// spaced_kmer_sketching_tpu/utils/boosthash.py), not copied from Boost.
//
//   modern (boost >= 1.81, default):
//     hash_combine(seed, v): seed = hash_mix(seed + 0x9e3779b9 + hash_value(v))
//     hash_mix(x): x ^= x>>32; x *= 0xe9846af9b1a615d; x ^= x>>32;
//                  x *= 0xe9846af9b1a615d; x ^= x>>28;
//   legacy (boost < 1.81, -DSKS_SHIM_LEGACY_HASH), 64-bit murmur-style:
//     k = hash_value(v); k *= m; k ^= k>>47; k *= m;
//     seed ^= k; seed *= m; seed += 0xe6546b64;   (m = 0xc6a4a7935bd1e995)
//
// Integral values that fit in size_t hash to themselves in both variants.
#ifndef SKS_SHIM_BOOST_HASH_HPP
#define SKS_SHIM_BOOST_HASH_HPP

#include <cstddef>
#include <cstdint>
#include <type_traits>
#include <vector>

namespace boost {

template <typename T,
          typename std::enable_if<std::is_integral<T>::value, int>::type = 0>
inline std::size_t hash_value(T v) {
  return static_cast<std::size_t>(v);
}

namespace hash_detail {
inline std::size_t hash_mix(std::size_t x) {
  const std::size_t m = 0xe9846af9b1a615dull;
  x ^= x >> 32;
  x *= m;
  x ^= x >> 32;
  x *= m;
  x ^= x >> 28;
  return x;
}
}  // namespace hash_detail

template <typename T>
inline void hash_combine(std::size_t &seed, const T &v);

template <typename T, typename A>
inline std::size_t hash_value(const std::vector<T, A> &v) {
  // hash_range over the elements from seed 0
  std::size_t seed = 0;
  for (const T &x : v) hash_combine(seed, x);
  return seed;
}

template <typename T>
inline void hash_combine(std::size_t &seed, const T &v) {
#ifdef SKS_SHIM_LEGACY_HASH
  const std::size_t m = 0xc6a4a7935bd1e995ull;
  std::size_t k = hash_value(v);
  k *= m;
  k ^= k >> 47;
  k *= m;
  seed ^= k;
  seed *= m;
  seed += 0xe6546b64ull;
#else
  seed = hash_detail::hash_mix(seed + 0x9e3779b9ull + hash_value(v));
#endif
}

template <typename T>
struct hash {
  std::size_t operator()(const T &v) const { return hash_value(v); }
};

}  // namespace boost

#endif  // SKS_SHIM_BOOST_HASH_HPP
