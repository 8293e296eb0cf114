// Shim: boost::algorithm::trim (src/options.cpp:241).
#pragma once

#include <cctype>
#include <string>

namespace boost {
namespace algorithm {

inline void trim(std::string &s) {
    size_t b = 0, e = s.size();
    while (b < e && std::isspace(static_cast<unsigned char>(s[b]))) ++b;
    while (e > b && std::isspace(static_cast<unsigned char>(s[e - 1]))) --e;
    s = s.substr(b, e - b);
}

}  // namespace algorithm
}  // namespace boost
