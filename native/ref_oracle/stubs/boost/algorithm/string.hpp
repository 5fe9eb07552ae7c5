// rtpose.cpp includes <boost/algorithm/string.hpp> but uses no symbols
// from it (resolution parsing is sscanf-based).
#ifndef REF_ORACLE_BOOST_ALGO_STRING_HPP_
#define REF_ORACLE_BOOST_ALGO_STRING_HPP_
#endif
