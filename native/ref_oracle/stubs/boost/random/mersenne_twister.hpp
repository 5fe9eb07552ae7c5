// boost/random/mersenne_twister.hpp -> stub (see ../random.hpp)
#ifndef REF_ORACLE_BOOST_MT_HPP_
#define REF_ORACLE_BOOST_MT_HPP_
#include "boost/random.hpp"
#endif
