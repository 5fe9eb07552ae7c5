function CHECK(cond, msg)
  % glog-style CHECK used across the matcaffe classes (the reference keeps
  % this in matlab/+caffe/private/CHECK.m).
  if ~cond
    error(msg);
  end
end
