// boost/random/uniform_int.hpp -> stub (see ../random.hpp)
#ifndef REF_ORACLE_BOOST_UI_HPP_
#define REF_ORACLE_BOOST_UI_HPP_
#include "boost/random.hpp"
#endif
