// Mini libigl stub: repmat == Eigen's replicate.
#ifndef MINI_IGL_REPMAT_H
#define MINI_IGL_REPMAT_H
#include <Eigen/Dense>
namespace igl {
template <typename DerivedA, typename DerivedB>
void repmat(const Eigen::MatrixBase<DerivedA> &A, int r, int c,
            Eigen::PlainObjectBase<DerivedB> &B) {
  B = A.replicate(r, c);
}
}  // namespace igl
#endif
