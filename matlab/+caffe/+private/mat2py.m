function arr = mat2py(m)
  % matcaffe W x H x C x N (BGR) -> numpy N x C x H x W
  % (reverse of the reference's matlab_to_blob permute, caffe_.cpp)
  nd = ndims(m);
  if nd < 4
    m = reshape(m, [size(m, 1), size(m, 2), size(m, 3), 1]);
  end
  m = permute(m, [4 3 2 1]);  % N C H W
  arr = py.numpy.asarray(single(m));
end
