// rtpose.cpp includes <boost/thread/thread.hpp>; route to the stub.
#include "../thread.hpp"
