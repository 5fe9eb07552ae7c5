// empty: parallel.hpp includes it; the oracle compiles no parallel/solver code
#ifndef REF_ORACLE_BOOST_PTIME_HPP_
#define REF_ORACLE_BOOST_PTIME_HPP_
#endif
