// Force-included before everything (see build.sh): tell modern Eigen that
// float is a "valid index type". Consequence: the Eigen-3.4 IndexedView
// operator() overload SFINAEs out for float subscripts and they fall through
// to the classic (Index, Index) coefficient accessor via implicit
// float->Index truncation — the Eigen-3.2 behavior the upstream
// `m(floor(y), floor(x))` reads were written against.
#ifndef MINI_EIGEN_FLOAT_INDEX_H
#define MINI_EIGEN_FLOAT_INDEX_H
#include <Eigen/Dense>
namespace Eigen {
namespace internal {
template <>
struct is_valid_index_type<float> {
  enum { value = true };
};
// RGBDOdometry's `m(floor(outu), floor(outv))` subscripts are double
template <>
struct is_valid_index_type<double> {
  enum { value = true };
};
}  // namespace internal
}  // namespace Eigen
#endif
