function m = py2mat(arr)
  % numpy caffe layout -> matcaffe layout: FULL dim reversal for any rank
  % (matcaffe's raw row-major<->column-major copy, caffe_.cpp), e.g.
  % N x C x H x W -> W x H x C x N and N x C -> C x N.
  m = single(arr);
  nd = ndims(m);
  if nd > 1
    m = permute(m, nd:-1:1);
  end
end
