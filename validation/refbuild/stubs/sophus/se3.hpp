// Mini Sophus stub: just SE3 exp/log with the real Sophus conventions
// (tangent = [upsilon(0:3); omega(3:6)], t = V(omega) * upsilon), written
// from the standard closed forms. Only the members the upstream SolveDVO
// touches exist: default ctor, setRotationMatrix, translation(),
// rotationMatrix(), static exp/log.
#ifndef MINI_SOPHUS_SE3_HPP
#define MINI_SOPHUS_SE3_HPP

#include <cmath>
#include <Eigen/Dense>

namespace Sophus {

template <typename Scalar>
class SE3 {
 public:
  typedef Eigen::Matrix<Scalar, 3, 3> Mat3;
  typedef Eigen::Matrix<Scalar, 3, 1> Vec3;
  typedef Eigen::Matrix<Scalar, 6, 1> Tangent;

  SE3() : R_(Mat3::Identity()), t_(Vec3::Zero()) {}
  SE3(const Mat3 &R, const Vec3 &t) : R_(R), t_(t) {}

  void setRotationMatrix(const Mat3 &R) { R_ = R; }
  Vec3 &translation() { return t_; }
  const Vec3 &translation() const { return t_; }
  Mat3 rotationMatrix() const { return R_; }

  static Mat3 hat(const Vec3 &w) {
    Mat3 m;
    m << Scalar(0), -w.z(), w.y(), w.z(), Scalar(0), -w.x(), -w.y(), w.x(),
        Scalar(0);
    return m;
  }

  static SE3 exp(const Tangent &psi) {
    const Vec3 upsilon = psi.template head<3>();
    const Vec3 omega = psi.template tail<3>();
    const Scalar theta = omega.norm();
    const Mat3 Omega = hat(omega);
    const Mat3 Omega2 = Omega * Omega;
    Mat3 R, V;
    if (theta < Scalar(1e-10)) {
      // 2nd-order Taylor: R ~ I + Omega + Omega^2/2, V ~ I + Omega/2 + Omega^2/6
      R = Mat3::Identity() + Omega + Scalar(0.5) * Omega2;
      V = Mat3::Identity() + Scalar(0.5) * Omega + Omega2 / Scalar(6);
    } else {
      const Scalar s = std::sin(theta), c = std::cos(theta);
      const Scalar t2 = theta * theta, t3 = t2 * theta;
      R = Mat3::Identity() + (s / theta) * Omega + ((Scalar(1) - c) / t2) * Omega2;
      V = Mat3::Identity() + ((Scalar(1) - c) / t2) * Omega +
          ((theta - s) / t3) * Omega2;
    }
    return SE3(R, V * upsilon);
  }

  static Tangent log(const SE3 &g) {
    // omega from the rotation log
    const Mat3 &R = g.R_;
    Scalar cos_theta = (R.trace() - Scalar(1)) / Scalar(2);
    cos_theta = std::min(Scalar(1), std::max(Scalar(-1), cos_theta));
    const Scalar theta = std::acos(cos_theta);
    Vec3 omega;
    Mat3 Vinv;
    const Mat3 S = (R - R.transpose()) / Scalar(2);
    Vec3 axis(S(2, 1), S(0, 2), S(1, 0));
    if (theta < Scalar(1e-10)) {
      omega = axis;  // sin(theta)~theta: axis already ~omega
      Vinv = Mat3::Identity() - Scalar(0.5) * hat(omega);
    } else {
      omega = theta / std::sin(theta) * axis;
      const Mat3 Omega = hat(omega);
      const Scalar t2 = theta * theta;
      const Scalar half_theta = theta / Scalar(2);
      // V^{-1} = I - Omega/2 + (1/theta^2)(1 - theta cot(theta/2) / 2) Omega^2
      const Scalar coef =
          (Scalar(1) -
           theta * std::cos(half_theta) / (Scalar(2) * std::sin(half_theta))) /
          t2;
      Vinv = Mat3::Identity() - Scalar(0.5) * Omega + coef * Omega * Omega;
    }
    Tangent out;
    out.template head<3>() = Vinv * g.t_;
    out.template tail<3>() = omega;
    return out;
  }

 private:
  Mat3 R_;
  Vec3 t_;
};

typedef SE3<double> SE3d;
typedef SE3<float> SE3f;

}  // namespace Sophus
#endif
