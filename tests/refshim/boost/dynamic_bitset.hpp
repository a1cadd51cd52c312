// Minimal re-implementation of the boost::dynamic_bitset<> surface used by
// the reference (/root/reference/src), written from Boost's DOCUMENTED
// semantics so the reference sources compile unmodified in an environment
// without Boost.  This is original shim code, not copied from Boost.
//
// Parity notes (tests/test_reference_binary.py relies on these):
//  * Block = unsigned long (64-bit on this platform), matching
//    boost::dynamic_bitset<>'s default — so hash_value sees the same
//    [lo64, hi64] block vector as real Boost for 128-bit bitsets.
//  * hash_value(dynamic_bitset) follows Boost's published algorithm:
//      res = hash_value(m_num_bits); hash_combine(res, m_bits); return res;
//    with hash_combine/hash_range from our functional/hash.hpp shim
//    (modern >=1.81 chain by default; -DSKS_SHIM_LEGACY_HASH for <1.81).
//  * operator< is a most-significant-bit-first comparison (numeric for
//    equal-size operands) — the semantics the canonical-strand selection at
//    kmer_sliding.cpp:164-175 depends on.
//  * operator<< prints bit (size-1) down to bit 0 — the 128-char mask
//    column of the CSV (kmer-sketching.cpp:76).
#ifndef SKS_SHIM_DYNAMIC_BITSET_HPP
#define SKS_SHIM_DYNAMIC_BITSET_HPP

#include <cstddef>
#include <limits>
#include <ostream>
#include <vector>

#include <boost/functional/hash.hpp>

namespace boost {

template <typename Block = unsigned long,
          typename Allocator = std::allocator<Block>>
class dynamic_bitset {
 public:
  static constexpr std::size_t bits_per_block =
      std::numeric_limits<Block>::digits;

  std::vector<Block, Allocator> m_bits;
  std::size_t m_num_bits = 0;

  dynamic_bitset() = default;
  explicit dynamic_bitset(std::size_t num_bits, unsigned long value = 0)
      : m_bits((num_bits + bits_per_block - 1) / bits_per_block, Block(0)),
        m_num_bits(num_bits) {
    if (!m_bits.empty()) m_bits[0] = Block(value);
    sanitize();
  }

  std::size_t size() const { return m_num_bits; }
  std::size_t num_blocks() const { return m_bits.size(); }

  std::size_t count() const {
    std::size_t c = 0;
    for (Block b : m_bits) c += static_cast<std::size_t>(__builtin_popcountl(b));
    return c;
  }

  bool test(std::size_t pos) const {
    return (m_bits[pos / bits_per_block] >> (pos % bits_per_block)) & Block(1);
  }

  class reference {
    Block *blk_;
    unsigned off_;

   public:
    reference(Block &b, unsigned off) : blk_(&b), off_(off) {}
    reference &operator=(bool v) {
      if (v)
        *blk_ |= Block(1) << off_;
      else
        *blk_ &= ~(Block(1) << off_);
      return *this;
    }
    reference &operator=(const reference &r) { return *this = bool(r); }
    operator bool() const { return (*blk_ >> off_) & Block(1); }
  };

  bool operator[](std::size_t pos) const { return test(pos); }
  reference operator[](std::size_t pos) {
    return reference(m_bits[pos / bits_per_block],
                     static_cast<unsigned>(pos % bits_per_block));
  }

  dynamic_bitset &set(std::size_t pos, bool val = true) {
    (*this)[pos] = val;
    return *this;
  }
  dynamic_bitset &reset() {
    for (Block &b : m_bits) b = Block(0);
    return *this;
  }
  dynamic_bitset &flip() {
    for (Block &b : m_bits) b = ~b;
    sanitize();
    return *this;
  }

  // --- shifts (within the fixed size; overflow bits are dropped) ----------
  dynamic_bitset &operator<<=(std::size_t n) {
    if (n >= m_num_bits) return reset();
    const std::size_t wb = n / bits_per_block, rb = n % bits_per_block;
    const std::size_t nb = m_bits.size();
    for (std::size_t i = nb; i-- > 0;) {
      Block v = (i >= wb) ? (m_bits[i - wb] << rb) : Block(0);
      if (rb && i >= wb + 1)
        v |= m_bits[i - wb - 1] >> (bits_per_block - rb);
      m_bits[i] = v;
    }
    sanitize();
    return *this;
  }
  dynamic_bitset &operator>>=(std::size_t n) {
    if (n >= m_num_bits) return reset();
    const std::size_t wb = n / bits_per_block, rb = n % bits_per_block;
    const std::size_t nb = m_bits.size();
    for (std::size_t i = 0; i < nb; ++i) {
      Block v = (i + wb < nb) ? (m_bits[i + wb] >> rb) : Block(0);
      if (rb && i + wb + 1 < nb)
        v |= m_bits[i + wb + 1] << (bits_per_block - rb);
      m_bits[i] = v;
    }
    return *this;
  }
  friend dynamic_bitset operator<<(dynamic_bitset a, std::size_t n) {
    a <<= n;
    return a;
  }
  friend dynamic_bitset operator>>(dynamic_bitset a, std::size_t n) {
    a >>= n;
    return a;
  }

  // --- bitwise ops (operands have equal size in the reference) ------------
  dynamic_bitset &operator&=(const dynamic_bitset &o) {
    for (std::size_t i = 0; i < m_bits.size(); ++i) m_bits[i] &= o.m_bits[i];
    return *this;
  }
  dynamic_bitset &operator|=(const dynamic_bitset &o) {
    for (std::size_t i = 0; i < m_bits.size(); ++i) m_bits[i] |= o.m_bits[i];
    return *this;
  }
  dynamic_bitset &operator^=(const dynamic_bitset &o) {
    for (std::size_t i = 0; i < m_bits.size(); ++i) m_bits[i] ^= o.m_bits[i];
    return *this;
  }
  friend dynamic_bitset operator&(dynamic_bitset a, const dynamic_bitset &b) {
    a &= b;
    return a;
  }
  friend dynamic_bitset operator|(dynamic_bitset a, const dynamic_bitset &b) {
    a |= b;
    return a;
  }
  friend dynamic_bitset operator^(dynamic_bitset a, const dynamic_bitset &b) {
    a ^= b;
    return a;
  }
  dynamic_bitset operator~() const {
    dynamic_bitset r = *this;
    for (Block &b : r.m_bits) b = ~b;
    r.sanitize();
    return r;
  }

  friend bool operator==(const dynamic_bitset &a, const dynamic_bitset &b) {
    return a.m_num_bits == b.m_num_bits && a.m_bits == b.m_bits;
  }
  friend bool operator!=(const dynamic_bitset &a, const dynamic_bitset &b) {
    return !(a == b);
  }
  // Most-significant-bit-first comparison; for the equal-size operands the
  // reference compares this is the plain numeric order over the blocks.
  friend bool operator<(const dynamic_bitset &a, const dynamic_bitset &b) {
    std::size_t i = a.m_bits.size(), j = b.m_bits.size();
    while (i > j) {
      if (a.m_bits[--i]) return false;
    }
    while (j > i) {
      if (b.m_bits[--j]) return true;
    }
    while (i-- > 0) {
      if (a.m_bits[i] != b.m_bits[i]) return a.m_bits[i] < b.m_bits[i];
    }
    return false;
  }

  friend std::ostream &operator<<(std::ostream &os, const dynamic_bitset &a) {
    for (std::size_t i = a.m_num_bits; i-- > 0;)
      os << (a.test(i) ? '1' : '0');
    return os;
  }

  // Boost's documented hash: res = hash_value(num_bits);
  // hash_combine(res, blocks vector); return res.
  friend std::size_t hash_value(const dynamic_bitset &a) {
    std::size_t res = boost::hash_value(a.m_num_bits);
    boost::hash_combine(res, a.m_bits);
    return res;
  }

 private:
  void sanitize() {
    const std::size_t extra = m_bits.size() * bits_per_block - m_num_bits;
    if (extra && !m_bits.empty())
      m_bits.back() &= (~Block(0)) >> extra;
  }
};

}  // namespace boost

// The reference's kmer_hash uses std::hash<kmer_bitset> (kmer.hpp:115); the
// values only steer unordered_map bucketing (unobservable in any output),
// so any deterministic function is parity-safe here.
namespace std {
template <typename B, typename A>
struct hash<boost::dynamic_bitset<B, A>> {
  std::size_t operator()(const boost::dynamic_bitset<B, A> &a) const {
    std::size_t h = a.m_num_bits;
    for (auto blk : a.m_bits) h = h * 1099511628211ull ^ blk;
    return h;
  }
};
}  // namespace std

#endif  // SKS_SHIM_DYNAMIC_BITSET_HPP
