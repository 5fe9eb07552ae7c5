// boost::function -> std::function
#ifndef REF_ORACLE_BOOST_FUNCTION_HPP_
#define REF_ORACLE_BOOST_FUNCTION_HPP_
#include <functional>
namespace boost {
using std::function;
}
#endif
