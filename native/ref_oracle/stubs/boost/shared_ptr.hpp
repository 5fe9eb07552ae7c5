// boost::shared_ptr -> std::shared_ptr (no boost in this image).
#ifndef REF_ORACLE_BOOST_SHARED_PTR_HPP_
#define REF_ORACLE_BOOST_SHARED_PTR_HPP_
#include <memory>
namespace boost {
using std::shared_ptr;
using std::weak_ptr;
using std::make_shared;
using std::static_pointer_cast;
using std::dynamic_pointer_cast;
using std::const_pointer_cast;
}  // namespace boost
#endif
