// Minimal Rcpp.h stand-in for compiling the reference kernels
// (/root/reference/lib/{DeNovoAssembler,BreakageScorer}.cpp) as plain C++
// golden-fixture generators, without R. Only the surface those two files
// actually touch is provided: Rcpp::List::create, Rcpp::Named("x") = v,
// Rcpp::wrap, and `using namespace Rcpp`.
#pragma once

#include <string>
#include <utility>
#include <variant>
#include <vector>

namespace Rcpp {

using Value = std::variant<std::vector<std::string>, std::vector<int>,
                           std::vector<double>,
                           std::vector<std::vector<double>>>;

// Rcpp::wrap is an identity at fixture level; the harness serializes later.
template <typename T>
const T &wrap(const T &v) {
  return v;
}

struct NamedValue {
  std::string name;
  Value value;
};

struct Named {
  std::string name;
  explicit Named(std::string n) : name(std::move(n)) {}
  template <typename T>
  NamedValue operator=(const T &v) {
    return NamedValue{name, Value(v)};
  }
};

class List {
 public:
  std::vector<NamedValue> items;

  template <typename... Args>
  static List create(Args &&...args) {
    List l;
    (l.items.push_back(std::forward<Args>(args)), ...);
    return l;
  }

  template <typename T>
  const T &get(const std::string &key) const {
    for (const auto &it : items) {
      if (it.name == key) return std::get<T>(it.value);
    }
    throw std::runtime_error("missing list element: " + key);
  }
};

}  // namespace Rcpp
